from .precision import Policy, DEFAULT_POLICY, PARITY_POLICY
from .mesh import make_mesh, data_sharding, replicated_sharding
from .config import ConfigBase, snapshot_config
