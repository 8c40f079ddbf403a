"""Dataset layer: UCI/synthetic regression, image classification."""

import numpy as _np


def permute_dataset(x, y, seed=0):
    """Seeded permutation (reference regression/data.py:292-295 ==
    classification/data.py:73-76; single canonical implementation)."""
    idx = _np.random.RandomState(seed).permutation(x.shape[0])
    return x[idx], y[idx]


from snngp.data.regression import (
    DATASETS as REGRESSION_DATASETS, get_dataset, split_dataset,
)

__all__ = ["REGRESSION_DATASETS", "get_dataset", "permute_dataset", "split_dataset"]
