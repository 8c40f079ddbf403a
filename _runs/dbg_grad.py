"""Bisect the design-scale svtp-myrtle training NaN: grad at init, per term."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import random
from snngp.data.classification import get_train_dataset
from snngp.cli.classification import _make_model
from snngp.data.resize import bilinear_resize

SEED = 109
(x_train, y_train), (x_valid, y_valid), (num_class, dn, msg) = get_train_dataset(
    "synthetic32", "./data", num_data=8192, valid_prop=0.1, normalize=True, seed=SEED)
x_train = bilinear_resize(x_train, 16, 16)

label_class = np.array([np.sum(y_train == ci) for ci in range(num_class)])
nic = np.round(256 * label_class / label_class.sum()).astype(int).tolist()
ip = np.concatenate([x_train[y_train == ci][:ni] for ci, ni in zip(range(num_class), nic)], axis=0)
print("inducing:", ip.shape, flush=True)

model = _make_model("svtp", "myrtle", 5, "relu", 1.0, 1e-8, 1.0, 2.0, 2.0, num_class, ip, 1e-6)
params = model.init_params()
num_train = x_train.shape[0]
xb = jnp.asarray(x_train[:256]); yb = jnp.asarray(y_train[:256])
key = random.PRNGKey(SEED)

def report(name, tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    bad = [(jax.tree_util.keystr(k), float(jnp.abs(v).max())) for k, v in flat
           if not bool(jnp.isfinite(v).all())]
    allmax = max(float(jnp.abs(v).max()) for _, v in flat)
    print(f"{name}: {'NaN in ' + str(bad) if bad else f'finite (max abs {allmax:.3e})'}", flush=True)

# Full loss
val, g = jax.value_and_grad(lambda p: model.loss(p, key, xb, yb, num_train, 100))(params)
print("loss value:", float(val), flush=True)
report("grad[full loss]", g)

# KL only
def kl_only(p):
    from snngp.models import params as P
    a_b, b_b, _, _, k_ii, k_ii_inv, q_mu, q_sqrt = model._posterior_pieces(p, xb)
    return model.prior.kl_divergence(p["prior"], k_ii, k_ii_inv, q_mu, q_sqrt,
                                     model.num_inducing, model.num_latent_gps) / num_train
report("grad[KL]", jax.grad(kl_only)(params))

# ll only
def ll_only(p):
    from snngp.ops import log_likelihood
    a_b, b_b, _, _, k_ii, k_ii_inv, q_mu, q_sqrt = model._posterior_pieces(p, xb)
    mean = q_mu @ a_b.T
    cov = jnp.einsum("ij,cj,kj->cik", a_b, q_sqrt, a_b) + b_b[None, :, :]
    sampled_f = model.prior.sample_f(p["prior"], key, mean, cov, 100)
    return -log_likelihood(sampled_f, yb)
report("grad[-ll]", jax.grad(ll_only)(params))

# pieces
for nm, idx in [("a_b", 0), ("b_b", 1), ("k_rel_inv", 2), ("k_ii_inv", 5)]:
    def piece(p, idx=idx):
        out = model._posterior_pieces(p, xb)[idx]
        return jnp.sum(out * out)
    report(f"grad[sum {nm}^2]", jax.grad(piece)(params))

# forward pieces finiteness + cov spectrum
a_b, b_b, k_rel_inv, k_bi, k_ii, k_ii_inv, q_mu, q_sqrt = model._posterior_pieces(params, xb)
cov = jnp.einsum("ij,cj,kj->cik", a_b, q_sqrt, a_b) + b_b[None, :, :]
ev = jnp.linalg.eigvalsh(cov)
print("cov evals per class: min", np.asarray(ev[:, 0]), "max", np.asarray(ev[:, -1]), flush=True)
evk = jnp.linalg.eigvalsh(k_ii)
print("k_ii eig range:", float(evk[0]), float(evk[-1]), flush=True)
