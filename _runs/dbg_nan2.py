import numpy as np, jax, jax.numpy as jnp
from snngp.data.classification import get_train_dataset
from snngp.cli.classification import _make_model

(x_train, y_train), (x_valid, y_valid), (num_class, dn, msg) = get_train_dataset(
    "synthetic32", "./data", num_data=8192, valid_prop=0.1, normalize=True, seed=10)
x_train = np.asarray(jax.image.resize(jnp.asarray(x_train), (x_train.shape[0], 16, 16, 3), "bilinear"))
x_valid = np.asarray(jax.image.resize(jnp.asarray(x_valid), (x_valid.shape[0], 16, 16, 3), "bilinear"))

label_class = np.array([np.sum(y_train == ci) for ci in range(num_class)])
nic = np.round(256 * label_class / label_class.sum()).astype(int).tolist()
ip = np.concatenate([x_train[y_train == ci][:ni] for ci, ni in zip(range(num_class), nic)], axis=0)

model = _make_model("svtp", "myrtle", 5, "relu", 1.0, 1e-8, 1.0, 2.0, 2.0, num_class, ip, 1e-6)
params = model.init_params()
xb, yb = x_valid[:256], y_valid[:256]

a_b, b_b, chol_rel, k_bi, k_ii, k_ii_inv, q_mu, q_sqrt = model._posterior_pieces(params, jnp.asarray(xb))
print("b_b diag min/max:", float(jnp.diagonal(b_b).min()), float(jnp.diagonal(b_b).max()), flush=True)
test_cov = jnp.einsum("ij,cj,kj->cik", a_b, q_sqrt, a_b) + b_b[None, :, :]
dg = jnp.diagonal(test_cov, axis1=1, axis2=2)
print("test_cov diag min:", float(dg.min()), flush=True)
print("chol_rel finite:", bool(jnp.isfinite(chol_rel).all()), flush=True)
print("a_b finite:", bool(jnp.isfinite(a_b).all()), "max", float(jnp.abs(a_b).max()), flush=True)
print("k_ii_inv finite:", bool(jnp.isfinite(k_ii_inv).all()), "max", float(jnp.abs(k_ii_inv).max()), flush=True)

key = jax.random.PRNGKey(0)
nll, cc = model.test_acc_nll(params, key, jnp.asarray(xb), jnp.asarray(yb), 1000)
print("valid nll:", float(nll), "correct:", float(cc), flush=True)

# train-path pieces too (nELBO was nan during epoch 1 as well)
xt, yt = x_train[:256], y_train[:256]
loss = model.loss(params, key, jnp.asarray(xt), jnp.asarray(yt), x_train.shape[0], 100)
print("train nELBO:", float(loss), flush=True)
