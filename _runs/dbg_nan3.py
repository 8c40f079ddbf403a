import numpy as np, jax, jax.numpy as jnp
from jax import random
from snngp.data.classification import get_train_dataset
from snngp.cli.classification import _make_model
from snngp.utils import DataLoader

SEED = 109
(x_train, y_train), (x_valid, y_valid), (num_class, dn, msg) = get_train_dataset(
    "synthetic32", "./data", num_data=8192, valid_prop=0.1, normalize=True, seed=SEED)
x_train = np.asarray(jax.image.resize(jnp.asarray(x_train), (x_train.shape[0], 16, 16, 3), "bilinear"))
x_valid = np.asarray(jax.image.resize(jnp.asarray(x_valid), (x_valid.shape[0], 16, 16, 3), "bilinear"))

label_class = np.array([np.sum(y_train == ci) for ci in range(num_class)])
nic = np.round(256 * label_class / label_class.sum()).astype(int).tolist()
ip = np.concatenate([x_train[y_train == ci][:ni] for ci, ni in zip(range(num_class), nic)], axis=0)
print("inducing:", ip.shape, flush=True)

model = _make_model("svtp", "myrtle", 5, "relu", 1.0, 1e-8, 1.0, 2.0, 2.0, num_class, ip, 1e-6)
params = model.init_params()

valid_loader = DataLoader(x_valid, y_valid, batch_size=256, shuffle=False)
key = random.PRNGKey(SEED)
for bi, (xb, yb) in enumerate(valid_loader):
    key, sk = random.split(key)
    nll, cc = model.test_acc_nll(params, sk, jnp.asarray(xb), jnp.asarray(yb), 1000)
    print(f"batch {bi} size {xb.shape[0]}: nll {float(nll):.6f} correct {int(cc)}", flush=True)
    if not np.isfinite(float(nll)):
        a_b, b_b, chol_rel, k_bi, k_ii, k_ii_inv, q_mu, q_sqrt = model._posterior_pieces(params, jnp.asarray(xb))
        for nm, v in [("a_b", a_b), ("b_b", b_b), ("chol_rel", chol_rel), ("k_bi", k_bi), ("k_ii_inv", k_ii_inv)]:
            print(" ", nm, "finite:", bool(jnp.isfinite(v).all()), flush=True)
        tc = jnp.einsum("ij,cj,kj->cik", a_b, q_sqrt, a_b) + b_b[None, :, :]
        dg = jnp.diagonal(tc, axis1=1, axis2=2)
        print("  test_cov diag min:", float(dg.min()), flush=True)
        mean_w = jnp.linalg.solve  # noqa
        sf = model.prior.sample_f_iid(params["prior"], sk, (q_mu @ a_b.T), tc, 1000)
        print("  sampled_f finite:", bool(jnp.isfinite(sf).all()), flush=True)
