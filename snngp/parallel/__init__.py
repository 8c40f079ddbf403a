"""Device-mesh runtime: sharded Gram construction, distributed Cholesky,
distributed ML-II training step."""

from snngp.parallel.mesh import get_mesh, device_count
from snngp.parallel.gram import sharded_gram
from snngp.parallel.cholesky import distributed_cholesky
from snngp.parallel.mlii import (sharded_aug_gram,
                                 distributed_mlii_value_and_grad)

__all__ = ["get_mesh", "device_count", "sharded_gram",
           "distributed_cholesky", "sharded_aug_gram",
           "distributed_mlii_value_and_grad"]
