import time, os
t0 = time.time()
import numpy as np
from snngp.data.classification import get_train_dataset
print("imports", time.time() - t0, flush=True)

t0 = time.time()
ds = get_train_dataset("synthetic32", "./data", num_data=8192, valid_prop=0.1,
                       normalize=True, seed=10)
(x_train, y_train), (x_valid, y_valid), (num_class, dn, msg) = ds
print("dataset", time.time() - t0, x_train.shape, flush=True)

t0 = time.time()
import jax, jax.numpy as jnp
x_small = np.asarray(jax.image.resize(jnp.asarray(x_train),
                                      (x_train.shape[0], 16, 16, 3), "bilinear"))
print("resize", time.time() - t0, x_small.shape, flush=True)
