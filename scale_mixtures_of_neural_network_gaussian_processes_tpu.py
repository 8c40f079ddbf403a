"""Long-name alias for the :mod:`snngp` package.

``import scale_mixtures_of_neural_network_gaussian_processes_tpu as smx``
re-exports the full framework surface.
"""

from snngp import *  # noqa: F401,F403
from snngp import nn, ops, models, parallel, utils, data, __version__  # noqa: F401
