from . import idbooth
from . import multi_identity
