"""North-star pipeline at configurable scale: Myrtle-CNN NNGP Gram (full
spatial-covariance tier, tiled), Cholesky factorization, Student-t predictive
(BASELINE.md: "CIFAR-10 50k x 50k conv-NNGP + distributed Cholesky +
Student-t predictive").

The full-covariance state for a (t, t) tile pair at 32x32 resolution is
[t, t, 32, 32, 32, 32] — tile size bounds VMEM/HBM peak, so the Gram is
assembled tile-by-tile with one jitted tile function (symmetric: only the
upper triangle is computed). Defaults are sized for a single chip; the same
loop shards row panels over a mesh via snngp.parallel.

Usage:
    python examples/cifar_myrtle.py --n-train 128 --n-test 32 --image-size 16
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from snngp.nn.full import get_myrtle_kernel
from snngp.utils.profiling import Profiler


def load_images(n, image_size, seed):
    """CIFAR-10 batches if cached under ./data, else seeded synthetic."""
    try:
        from snngp.data.classification import _load_cifar10_dir
        x, y, _ = _load_cifar10_dir("./data/cifar10", "train")
        x = x[:n] / 255.0
    except Exception:
        rng = np.random.RandomState(seed)
        x = rng.rand(n, 32, 32, 3)
        y = rng.randint(10, size=n)
    # Host-side resize (1-ULP match to jax.image.resize): avoids pushing the
    # full 32x32 dataset through the remote-device tunnel just to shrink it.
    from snngp.data.resize import bilinear_resize
    x = jnp.asarray(bilinear_resize(np.asarray(x, np.float32),
                                    image_size, image_size))
    return x, jnp.asarray(np.asarray(y[:n], np.float32))


def tiled_gram(kernel_fn, x1, x2, tile, symmetric, mesh=None, chunk=0,
               remat=False):
    """Assemble K[x1, x2] from jitted (tile, tile) full-covariance blocks.

    With ``chunk > 0``, batches ``chunk`` blocks per device dispatch inside
    one lax.scan (snngp.nn.full.scan_tiled_gram) — essential through a
    remote-device tunnel where each dispatch costs ~1 s of host latency.
    With a mesh, each row-tile's [tile, n2] strip is computed with the column
    batch sharded over devices (snngp.parallel.sharded_gram)."""
    n1, n2 = x1.shape[0], x2.shape[0]
    assert n1 % tile == 0 and n2 % tile == 0

    if chunk and mesh is None:
        from snngp.nn.full import scan_tiled_gram
        return jnp.asarray(scan_tiled_gram(
            kernel_fn, x1, None if symmetric else x2, tile=tile, chunk=chunk,
            remat=remat))

    if mesh is not None:
        from snngp.parallel import sharded_gram
        out = np.zeros((n1, n2), np.float32)
        for i in range(0, n1, tile):
            out[i:i + tile] = np.asarray(
                sharded_gram(kernel_fn, x1[i:i + tile], mesh, x2=x2))
        return jnp.asarray(out)

    @jax.jit
    def block(a, b):
        return kernel_fn(a, b, get="nngp")

    out = np.zeros((n1, n2), np.float32)
    for i in range(0, n1, tile):
        j_start = i if symmetric else 0
        for j in range(j_start, n2, tile):
            blk = np.asarray(block(x1[i:i + tile], x2[j:j + tile]))
            out[i:i + tile, j:j + tile] = blk
            if symmetric and j > i:
                out[j:j + tile, i:i + tile] = blk.T
    return jnp.asarray(out)


def mlii_fit(args, x_sub, y_sub):
    """ML-II fit of the Myrtle kernel scales + eps (+ Student-t a, b) on a
    training subset, full-batch Adam on the marginal NLL — the reference's
    ``reg tr`` recipe (regression/train.py:61-67) applied to the north-star
    conv architecture. Gradients w.r.t. the three scale scalars run through
    the fused Pallas kernel's scalar-tangent backward
    (``myrtle_gram(trainable_inputs=False)``), so each step costs ~3 fused
    forwards instead of an XLA-tier reverse recursion over the full
    spatial-covariance state (which OOMs at these subset sizes)."""
    import time

    from snngp.models import params as P
    from snngp.models.gp import SPR
    from snngp.models.kernels import NNGPKernel
    from snngp.models.likelihoods import (GaussianLikelihood,
                                          StudentTLikelihood)
    from snngp.nn.arch import get_myrtle_kernel as myrtle_builder
    from snngp.utils.optim import Adam

    def get_kernel_fn(w_std, b_std, last_w_std):
        return myrtle_builder(args.depth, 1, "relu", w_std=w_std, b_std=b_std,
                              last_w_std=last_w_std, trainable_inputs=False)

    kernel = NNGPKernel(get_kernel_fn, 1.0, 0.1, 1.0)
    lik = (StudentTLikelihood(args.alpha, args.beta)
           if args.mlii_method == "tp" else GaussianLikelihood())
    model = SPR(kernel, lik, x_sub, y_sub, 0.0, 1.0, eps=args.eps)
    params = model.init_params()
    opt = Adam()
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(model.loss)(params)
        params, opt_state = opt.update(grads, opt_state, params, args.mlii_lr)
        return loss, params, opt_state

    t0 = time.time()
    for i in range(args.mlii):
        loss, params, opt_state = step(params, opt_state)
        if i % max(1, args.mlii // 8) == 0 or i == args.mlii - 1:
            print(f"[mlii] step {i + 1}/{args.mlii}: "
                  f"nll {float(loss):.4f}")
    w, b, l = kernel.get_params(params["kernel"])
    hyper = dict(w_std=float(w), b_std=float(b), last_w_std=float(l))
    eps = float(P.constrained_read(params["eps"], model.bij))
    alpha, beta = args.alpha, args.beta
    if args.mlii_method == "tp":
        a, b_ = lik._ab(params["likelihood"])
        alpha, beta = float(a), float(b_)
    print(f"[mlii] {args.mlii} steps on N={x_sub.shape[0]} in "
          f"{time.time() - t0:.1f}s -> {hyper} eps {eps:.3e}"
          + (f" a {alpha:.3f} b {beta:.3f}"
             if args.mlii_method == "tp" else ""))
    return hyper, eps, alpha, beta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--n-test", type=int, default=32)
    ap.add_argument("--image-size", type=int, default=16)
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--depth", type=int, default=5, choices=[5, 7, 10])
    ap.add_argument("--alpha", type=float, default=2.0)
    ap.add_argument("--beta", type=float, default=2.0)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 full-covariance state (halves tile memory; "
                         "GAP accumulates fp32)")
    ap.add_argument("--scan-chunk", type=int, default=0,
                    help="batch this many Gram tiles per device dispatch "
                         "inside lax.scan (>=32 recommended through the "
                         "remote tunnel; 0 = per-tile dispatch)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint each tile inside the scan (lower "
                         "peak memory per chunk)")
    ap.add_argument("--devices", type=int, default=1,
                    help="shard Gram row panels over an N-device mesh "
                         "(snngp.parallel.sharded_gram; N must divide the "
                         "data sizes)")
    ap.add_argument("--fused", choices=["auto", "on", "off"], default="auto",
                    help="use the fused Pallas Myrtle kernel "
                         "(snngp.ops.pallas.myrtle_gram; ~20x the XLA full "
                         "tier at 32x32). auto = TPU backend and a compiled "
                         "shape (8x8, 16x16 or 32x32)")
    ap.add_argument("--fused-block", type=int, default=512,
                    help="fixed dispatch block for the fused assembly")
    ap.add_argument("--resume-gram", default="",
                    help="directory for crash-resumable fused-Gram assembly: "
                         "each phase's Gram lives in an .npy memmap with a "
                         "block-done bitmap, flushed per block; re-running "
                         "with the same directory skips completed blocks "
                         "(remote TPU workers die transiently — at "
                         "north-star sizes the assembly is hours)")
    ap.add_argument("--mlii", type=int, default=0,
                    help="ML-II steps fitting (w_std, b_std, last_w_std, "
                         "eps[, a, b]) on an --mlii-n training subset before "
                         "building the big Gram; gradients run through the "
                         "fused kernel's scalar-tangent backward")
    ap.add_argument("--mlii-n", type=int, default=512,
                    help="subset size for the ML-II fit (subset scope only)")
    ap.add_argument("--mlii-scope", choices=["subset", "full"],
                    default="subset",
                    help="subset: reverse-mode full-batch Adam on an "
                         "--mlii-n subset (fits whatever one reverse-mode "
                         "factorization holds). full: the EXACT full-Gram "
                         "gradient at tiled scale — one augmented fused "
                         "assembly (K, dK/dw, dK/db) + in-place "
                         "factorization + streamed S^-1 panel contractions "
                         "per step (snngp.models.mlii), the reference's "
                         "full-batch ML-II (regression/train.py:61-67) at "
                         "sizes reverse-mode cannot touch")
    ap.add_argument("--mlii-panel", type=int, default=2048,
                    help="S^-1 panel width for the full-scope contraction")
    ap.add_argument("--mlii-method", choices=["gp", "tp"], default="tp",
                    help="marginal for the ML-II fit: Gaussian (gp) or "
                         "Student-t (tp; also learns a, b and feeds them to "
                         "the predictive)")
    ap.add_argument("--mlii-lr", type=float, default=1e-2,
                    help="Adam learning rate for the ML-II fit (the "
                         "reference regression default)")
    ap.add_argument("--chol", choices=["auto", "xla", "blocked", "inplace"],
                    default="auto",
                    help="factorization kernel: snngp's blocked right-looking"
                         " Cholesky, XLA's monolithic op, or the memory-lean"
                         " in-place kernel (donates the Gram, factors inside"
                         " its own buffer — the only one that fits the 50k"
                         " north star on a 16 GB chip, 5.3 s measured)."
                         " auto = inplace at N >= 32768 (single device),"
                         " blocked at N >= 4096 (XLA's op has a pathological"
                         " first-run cost at some large shapes — 185 s at"
                         " N=8192, 569 s at N=24576 on v5e — while the"
                         " blocked kernel's is 2-6 s)")
    ap.add_argument("--t-jitter", type=float, default=1e-6,
                    help="absolute jitter on the scaled Gram (b/a) K whose "
                         "factor defines the Student-t data scale d — the "
                         "reference's hardcoded 1e-6 "
                         "(spax/likelihoods.py:60-62). At north-star N the "
                         "Gram's fp32 representation noise exceeds 1e-6; "
                         "pass ~1e-4 there to keep the factorization PSD")
    ap.add_argument("--var-floor", type=float, default=1e-6,
                    help="posterior-variance floor relative to the prior "
                         "test variance (0 = reference's exact arithmetic; "
                         "at north-star N the fp32 posterior variance sits "
                         "below the cancellation noise of the [N]-long "
                         "contraction and needs the floor — see "
                         "tests/test_predictor.py::test_var_floor_f64)")
    args = ap.parse_args()

    x, y = load_images(args.n_train + args.n_test, args.image_size, seed=0)
    x_train, x_test = x[:args.n_train], x[args.n_train:]
    y_mean = jnp.mean(y[:args.n_train])
    y_std = jnp.std(y[:args.n_train])
    y_train = (y[:args.n_train] - y_mean) / y_std

    import jax.numpy as _jnp
    hyper = dict(w_std=1.0, b_std=0.1, last_w_std=1.0)
    if args.mlii and args.mlii_scope == "full":
        from snngp.models.mlii import mlii_fit_full
        from snngp.ops.pallas.myrtle_gram import (myrtle_gram_scale_grads,
                                                  myrtle_profile_tangents)

        def aug_builder(w, b, l):
            return lambda xa, xb, profiles=None: myrtle_gram_scale_grads(
                xa, xb, depth=args.depth, act="relu",
                w_std=w, b_std=b, last_w_std=l, profiles=profiles)

        def profile_builder(w, b):
            # per-block variance-profile cache: pays the N-linear profile
            # recursion once per block per step instead of once per tile
            return lambda xb: myrtle_profile_tangents(
                xb, depth=args.depth, act="relu", w_std=w, b_std=b)

        resume = (os.path.join(args.resume_gram, "mlii")
                  if args.resume_gram else None)
        hyper, args.eps, ab, _ = mlii_fit_full(
            aug_builder, x_train, np.asarray(y_train), steps=args.mlii,
            lr=args.mlii_lr, block=args.fused_block, init_hyper=hyper,
            eps=args.eps,
            ab=((args.alpha, args.beta)
                if args.mlii_method == "tp" else None),
            panel=args.mlii_panel, resume_dir=resume,
            profile_builder=profile_builder)
        if ab is not None:
            args.alpha, args.beta = ab
    elif args.mlii:
        n_fit = min(args.mlii_n, args.n_train)
        hyper, args.eps, args.alpha, args.beta = mlii_fit(
            args, x_train[:n_fit], y_train[:n_fit])
    kfn = get_myrtle_kernel(args.depth, 1, "relu",
                            dtype=_jnp.bfloat16 if args.bf16 else None,
                            **hyper)
    prof = Profiler()
    mesh = None
    if args.devices > 1:
        from snngp.parallel import get_mesh
        mesh = get_mesh(args.devices)

    fused = (args.fused == "on"
             or (args.fused == "auto" and jax.default_backend() == "tpu"
                 and args.image_size in (8, 16, 32)))
    # --bf16 + fused: measured on v5e (RESULTS.md round 3) the bf16 pair
    # state gives ZERO speedup (packed-bf16 VPU ops run at fp32 rate) and
    # Mosaic rejects bf16 rolls in compiled mode — so on TPU the fused path
    # stays fp32 and --bf16 only applies to the XLA tier. Interpret mode
    # (CPU tests) honors the bf16 request for numerics validation.
    fused_dtype = None
    if args.bf16 and fused:
        if jax.default_backend() == "tpu":
            print("[cifar_myrtle] --bf16 ignored on the fused TPU path "
                  "(no VPU win on v5e, see RESULTS.md); Gram stays fp32, "
                  "keeping the fp32-sized eps.")
        else:
            fused_dtype = "bf16"
    # bf16 Gram entries carry ~1e-2 relative noise; the solve needs a
    # matching regularizer to stay PSD. Only when bf16 actually applies —
    # the fp32 fused path keeps the user's eps (ADVICE r2).
    bf16_effective = args.bf16 and (not fused or fused_dtype == "bf16")
    if bf16_effective and args.eps < 1e-2:
        args.eps = 1e-2
    if fused and mesh is not None:
        # Row panels of the fused kernel over the mesh (zero traffic until
        # the solve; tests/test_myrtle_pallas.py validates on the CPU mesh).
        from snngp.ops.pallas.myrtle_gram import myrtle_gram_sharded

        def gram(a, b, symmetric, name=""):
            return jnp.asarray(myrtle_gram_sharded(
                a, None if symmetric else b, mesh, depth=args.depth,
                act="relu", dtype=fused_dtype, **hyper))
    elif fused:
        from snngp.ops.pallas.myrtle_gram import myrtle_gram_tiled
        if args.resume_gram:
            os.makedirs(args.resume_gram, exist_ok=True)

        def gram(a, b, symmetric, name=""):
            resume = (os.path.join(args.resume_gram, f"gram_{name}.npy")
                      if args.resume_gram else None)
            # Stays host-side (numpy): at north-star sizes the train Gram is
            # n^2 fp32 (4 GiB at N=32768) and parking it in HBM while the
            # cross/test Pallas blocks still have to dispatch OOMs the chip.
            # It is transferred (and donated) only at the Cholesky phase.
            return myrtle_gram_tiled(
                a, None if symmetric else b, depth=args.depth, act="relu",
                block=args.fused_block, log=print, dtype=fused_dtype,
                resume_path=resume, **hyper)
    else:
        def gram(a, b, symmetric, name=""):
            return tiled_gram(kfn, a, b, args.tile,
                              symmetric and mesh is None, mesh=mesh,
                              chunk=args.scan_chunk, remat=args.remat)

    with prof.phase("gram_train"):
        k_dd = prof.observe(gram(x_train, x_train, True, "train"))
    with prof.phase("gram_cross"):
        k_td = prof.observe(gram(x_test, x_train, False, "cross"))
    with prof.phase("gram_test"):
        k_tt = prof.observe(gram(x_test, x_test, True, "test"))

    # Everything downstream of Gram assembly — factorization routing, the
    # Student-t two-factorization data scale d (the reference's absolute
    # t-jitter, spax/likelihoods.py:60-62), the target solve, the variance
    # floor, de-normalized conditional-t scoring — defers to the tested
    # library serving path (snngp/models/predictor.py). The memory-lean
    # branch stages the host Gram and uploads it twice (scaled-Gram factor
    # for d, then the main factor) so only ONE full-size device buffer ever
    # exists; `auto` picks it exactly where the in-place factorization is
    # mandatory on a 16 GB chip.
    from snngp.models.gp import SPR
    from snngp.models.kernels import NNGPKernel
    from snngp.models.likelihoods import StudentTLikelihood
    from snngp.models.predictor import fit_spr
    from snngp.nn.arch import get_myrtle_kernel as myrtle_builder

    if args.chol == "inplace" and mesh is not None:
        raise SystemExit("--chol inplace is a single-device kernel (donated "
                         "fori-loop carry); with --devices use --chol "
                         "blocked, which shards under GSPMD.")
    memory_lean = (args.chol == "inplace"
                   or (args.chol == "auto" and args.n_train >= 32768
                       and mesh is None))
    chol_fn = None
    if not memory_lean and (args.chol == "blocked" or
                            (args.chol == "auto" and args.n_train >= 4096)):
        from snngp.parallel.cholesky import blocked_cholesky
        chol_fn = blocked_cholesky

    # --eps is ABSOLUTE (round 3 measured the north-star factorization PSD
    # at K + 1e-4 I); fit_spr applies neural_tangents' trace-relative
    # add_diag_reg, so convert: the applied regularizer is
    # eps_rel * tr(K)/N == args.eps exactly.
    tr_mean = float(np.trace(k_dd)) / args.n_train
    eps_rel = args.eps / tr_mean

    def kernel_builder(w_std, b_std, last_w_std):
        return myrtle_builder(args.depth, 1, "relu", w_std=w_std,
                              b_std=b_std, last_w_std=last_w_std,
                              trainable_inputs=False)

    kernel = NNGPKernel(kernel_builder, hyper["w_std"], hyper["b_std"],
                        hyper["last_w_std"])
    lik = StudentTLikelihood(args.alpha, args.beta, chol_fn=chol_fn)
    model = SPR(kernel, lik, x_train, y_train, y_mean, y_std, eps=eps_rel,
                mesh=mesh)
    params = model.init_params()

    with prof.phase("fit"):
        fitted = fit_spr(model, params, memory_lean=memory_lean, gram=k_dd,
                         var_floor=args.var_floor, t_jitter=args.t_jitter)
        prof.observe(fitted.state["alpha"])
    if memory_lean:
        del k_dd                          # donated into the fitted factor

    y_test_n = (y[args.n_train:] - y_mean) / y_std
    with prof.phase("predictive"):
        k_td_dev = jnp.asarray(k_td)
        k_tt_diag = jnp.diagonal(jnp.asarray(k_tt))
        if bf16_effective:
            # bf16 numerics-validation quirk: ~1e-2 relative Gram noise
            # needs an additive variance inflation the exact library
            # scoring doesn't model — score library outputs directly.
            from jax.scipy.stats import t as t_dist
            mean_d, var_d = fitted.predict_given(k_td_dev, k_tt_diag)
            var_d = var_d + 1e-2 * float(y_std) ** 2
            y_den = y_test_n * y_std + y_mean
            nll = prof.observe(-jnp.mean(t_dist.logpdf(
                y_den, fitted.state["cond_df"], mean_d, jnp.sqrt(var_d))))
        else:
            nll = prof.observe(fitted.test_nll_given(
                k_td_dev, k_tt_diag, y_test_n))

    print(prof.report())
    total = sum(prof.totals.values())
    print(f"\nN={args.n_train} Myrtle-{args.depth} ({args.image_size}x"
          f"{args.image_size}) pipeline total: {total:.2f}s  "
          f"t-predictive NLL (de-normalized, reference semantics): "
          f"{float(nll):.4f}")


if __name__ == "__main__":
    main()
