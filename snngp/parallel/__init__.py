"""Device-mesh runtime: sharded Gram construction, distributed Cholesky."""

from snngp.parallel.mesh import get_mesh, device_count
from snngp.parallel.gram import sharded_gram
from snngp.parallel.cholesky import distributed_cholesky

__all__ = ["get_mesh", "device_count", "sharded_gram", "distributed_cholesky"]
