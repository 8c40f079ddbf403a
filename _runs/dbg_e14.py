"""Reproduce the epoch-14 NaN from the epoch-13 checkpoint (design scale)."""
import sys; sys.path.insert(0, "/root/repo")
import os
import numpy as np, jax, jax.numpy as jnp
from jax import random
from snngp.data.classification import get_train_dataset
from snngp.cli.classification import _make_model
from snngp.data.resize import bilinear_resize
from snngp.models.params import get_by_suffix
from snngp.utils import load_named, DataLoader

os.environ.setdefault("SNNGP_SYNTH_N", "16384")
SEED = 109
CKPT = "_runs/design/svtp_myrtle_nd8192/013.npz"

(x_train, y_train), (x_valid, y_valid), (num_class, dn, msg) = get_train_dataset(
    "synthetic32", "./data", num_data=8192, valid_prop=0.1, normalize=True, seed=SEED)
x_train = bilinear_resize(x_train, 16, 16)

named = load_named(CKPT)
ip = get_by_suffix(named, "inducing_variable")
model = _make_model("svtp", "myrtle", 5, "relu", 1.0, 1e-8, 1.0, 2.0, 2.0,
                    num_class, ip, 1e-6)
params = model.init_params()
for k_ in ("w_std", "b_std", "last_w_std"):
    params["kernel"][k_] = jnp.asarray(get_by_suffix(named, k_))
params["q_mu"] = jnp.asarray(get_by_suffix(named, "q_mu"))
params["q_sqrt"] = jnp.asarray(get_by_suffix(named, "q_sqrt"))
params["prior"]["a"] = jnp.asarray(get_by_suffix(named, "a"))
params["prior"]["b"] = jnp.asarray(get_by_suffix(named, "b"))
eps_raw = get_by_suffix(named, "eps")
if eps_raw is not None:
    params["eps"] = jnp.asarray(eps_raw)
from snngp.models.bijectors import positive
from snngp.models import params as P
print("restored:", {k_: float(P.constrained_read(params["kernel"][k_], positive()))
                    for k_ in params["kernel"]},
      "eps", float(P.constrained_read(params["eps"], positive())), flush=True)

# Kernel finiteness at the drifted scales.
kfn = model.kernel.get_kernel_fn(params["kernel"])
z = params["inducing_variable"]
k_ii = model.kernel.K(kfn, z)
print("k_ii finite:", bool(jnp.isfinite(k_ii).all()),
      "eig:", float(jnp.linalg.eigvalsh(k_ii)[0]), float(jnp.linalg.eigvalsh(k_ii)[-1]), flush=True)

num_train = x_train.shape[0]
step_fn = jax.jit(jax.value_and_grad(
    lambda p, key, xb, yb: model.loss(p, key, xb, yb, num_train, 100)))

# Epoch-14 batch stream: DataLoader reshuffles per epoch from the run's key
# stream; we just scan all batches with a fixed key — the NaN trigger is a
# data/params condition, not a PRNG one.
loader = DataLoader(x_train, y_train, batch_size=256, shuffle=False)
key = random.PRNGKey(SEED + 14)
bad = 0
for bi, (xb, yb) in enumerate(loader):
    key, sk = random.split(key)
    val, g = step_fn(params, sk, jnp.asarray(xb), jnp.asarray(yb))
    gleaves = jax.tree_util.tree_leaves(g)
    gfin = all(bool(jnp.isfinite(x).all()) for x in gleaves)
    if not (np.isfinite(float(val)) and gfin):
        bad += 1
        print(f"batch {bi}: loss {float(val)} grad_finite={gfin}", flush=True)
        if bad == 1:
            # bisect: kernel blocks on this batch
            xbj = jnp.asarray(xb)
            k_bi = model.kernel.K(kfn, xbj, z)
            k_bb = model.kernel.K(kfn, xbj)
            print("  k_bi finite:", bool(jnp.isfinite(k_bi).all()),
                  " k_bb finite:", bool(jnp.isfinite(k_bb).all()), flush=True)
            a_b, b_b, k_rel_inv, _, k_ii2, k_ii_inv, q_mu, q_sqrt = \
                model._posterior_pieces(params, xbj)
            for nm, v in [("a_b", a_b), ("b_b", b_b), ("k_rel_inv", k_rel_inv),
                          ("k_ii_inv", k_ii_inv)]:
                print(f"  {nm} finite:", bool(jnp.isfinite(v).all()), flush=True)
            cov = jnp.einsum("ij,cj,kj->cik", a_b, q_sqrt, a_b) + b_b[None]
            ev = jnp.linalg.eigvalsh(cov)
            print("  cov eig min/max:", float(ev[:, 0].min()), float(ev[:, -1].max()), flush=True)
    if bad >= 3:
        break
print("done; bad batches:", bad, flush=True)
if bad == 0:
    # No per-batch NaN at these params: emulate steps with fresh Adam.
    from snngp.utils import Adam
    opt = Adam()
    state = opt.init(params)
    p = params
    n_batches = num_train // 256
    key2 = random.PRNGKey(1234)
    for step in range(60):
        key2, sk = random.split(key2)
        bi = step % n_batches
        xb, yb = x_train[bi*256:(bi+1)*256], y_train[bi*256:(bi+1)*256]
        val, g = step_fn(p, sk, jnp.asarray(xb), jnp.asarray(yb))
        if not np.isfinite(float(val)):
            print("step", step, "loss NaN", flush=True)
            from snngp.models import params as P2
            print({k_: float(P.constrained_read(p["kernel"][k_], positive()))
                   for k_ in p["kernel"]}, flush=True)
            break
        p, state = opt.update(g, state, p, 0.01)
        if step % 10 == 0:
            print("step", step, "loss", float(val),
                  {k_: round(float(P.constrained_read(p["kernel"][k_], positive())), 4)
                   for k_ in p["kernel"]}, flush=True)
    else:
        print("60 fresh-Adam steps all finite", flush=True)
