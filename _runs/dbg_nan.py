import numpy as np, jax, jax.numpy as jnp
from snngp.data.classification import get_train_dataset
from snngp.cli.classification import _make_model

(x_train, y_train), (x_valid, y_valid), (num_class, dn, msg) = get_train_dataset(
    "synthetic32", "./data", num_data=8192, valid_prop=0.1, normalize=True, seed=10)
x_train = np.asarray(jax.image.resize(jnp.asarray(x_train), (x_train.shape[0], 16, 16, 3), "bilinear"))

label_class = np.array([np.sum(y_train == ci) for ci in range(num_class)])
nic = np.round(256 * label_class / label_class.sum()).astype(int).tolist()
ip = np.concatenate([x_train[y_train == ci][:ni] for ci, ni in zip(range(num_class), nic)], axis=0)
print("inducing:", ip.shape, flush=True)

# 1) the raw kernel pieces first (cheapest to interpret)
from snngp.nn.arch import get_myrtle_kernel
kfn = get_myrtle_kernel(5, 10, "relu", w_std=1.0, b_std=1e-8, last_w_std=1.0, trainable_inputs=False)
kii = np.asarray(kfn(jnp.asarray(ip)))
print("kii finite:", np.isfinite(kii).all(), "diag range", kii.diagonal().min(), kii.diagonal().max(), flush=True)
L = np.asarray(jnp.linalg.cholesky(jnp.asarray(kii) + 1e-6 * jnp.eye(kii.shape[0])))
print("chol(k_ii + 1e-6 I) finite:", np.isfinite(L).all(), flush=True)
ev = np.linalg.eigvalsh(kii.astype(np.float64))
print("eig min/max:", ev.min(), ev.max(), flush=True)

# 2) the ELBO at the probe's exact config
model = _make_model("svtp", "myrtle", 5, "relu", 1.0, 1e-8, 1.0, 2.0, 2.0, num_class, ip, 1e-6)
params = model.init_params()
xb, yb = x_train[:256], y_train[:256]
key = jax.random.PRNGKey(0)
loss = model.loss(params, key, xb, yb, x_train.shape[0], 100)
print("nELBO:", loss, flush=True)
