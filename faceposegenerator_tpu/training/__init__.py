from . import idbooth
