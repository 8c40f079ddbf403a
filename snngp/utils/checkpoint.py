"""Checkpointing in the reference's .npz named-variable format.

``save_params`` writes ``{"names": [...], "0": leaf0, "1": leaf1, ...}`` —
byte-compatible with objax's ``save_var_collection`` layout that the
reference's test subcommands restore from by *name suffix*
(``experiments/regression/test.py:38-43``, ``classification/test.py:60-65``).
Stored values are the raw (unconstrained) parameters, exactly as objax stores
``TrainVar._value``.

:class:`Checkpointer` reproduces the best-loss-gated save + keep-last-k
pruning of ``experiments/utils.py:98-127``.
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np

from snngp.models.params import named_leaves

__all__ = ["save_params", "load_named", "Checkpointer"]


def save_params(path: str, params) -> None:
    leaves = named_leaves(params)
    payload = {"names": np.array([n for n, _ in leaves])}
    for i, (_, v) in enumerate(leaves):
        payload[str(i)] = np.asarray(v)
    with open(path, "wb") as f:
        np.savez(f, **payload)


def load_named(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint as {dotted_name: value}."""
    data = np.load(path, allow_pickle=False)
    names = [str(n) for n in data["names"]]
    return {name: data[str(i)] for i, name in enumerate(names)}


class Checkpointer:
    FILE_MATCH: str = "*.npz"
    FILE_FORMAT: str = "{:03d}.npz"

    def __init__(self, logdir: str, keep_ckpts: int = 10, makedir: bool = True):
        self.logdir = logdir
        self.keep_ckpts = keep_ckpts
        if makedir:
            os.makedirs(logdir, exist_ok=True)
        self.best_loss = float("inf")

    @classmethod
    def list_indices(cls, logdir: str):
        """Sorted integer indices of checkpoint files in ``logdir``.

        Only numeric-stem ``.npz`` files count — the directory may also hold
        non-checkpoint artifacts (e.g. a ``fitted.npz`` serving cache), which
        must be neither restored from nor pruned.
        """
        out = []
        for path in glob.glob(os.path.join(logdir, cls.FILE_MATCH)):
            stem = os.path.basename(path).rsplit(".", 1)[0]
            if stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def save(self, idx: int, params) -> None:
        save_params(os.path.join(self.logdir, self.FILE_FORMAT.format(idx)), params)
        for old in self.list_indices(self.logdir)[:-self.keep_ckpts]:
            os.remove(os.path.join(self.logdir, self.FILE_FORMAT.format(old)))

    def step(self, idx: int, loss: float, params) -> bool:
        if loss < self.best_loss:
            self.best_loss = loss
            self.save(idx, params)
            return True
        return False


# ---------------------------------------------------------------------------
# Full training-state checkpointing (resume support — absent in the
# reference, which only keeps best-model .npz for later eval; SURVEY.md §5).
# ---------------------------------------------------------------------------

def save_training_state(path: str, params, opt_state, meta: Dict) -> None:
    """Write params + optimizer state + loop metadata to one .npz.

    Pytrees are stored in flatten order and restored against live templates
    (same code version), so no pickling is involved.
    """
    import jax

    payload: Dict[str, np.ndarray] = {}
    p_leaves = jax.tree_util.tree_leaves(params)
    o_leaves = jax.tree_util.tree_leaves(opt_state)
    payload["num_params"] = np.array(len(p_leaves))
    payload["num_opt"] = np.array(len(o_leaves))
    for i, leaf in enumerate(p_leaves):
        payload[f"p{i}"] = np.asarray(leaf)
    for i, leaf in enumerate(o_leaves):
        payload[f"o{i}"] = np.asarray(leaf)
    for k, v in meta.items():
        payload[f"meta_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_training_state(path: str, params_template, opt_state_template):
    """Restore (params, opt_state, meta) against live pytree templates."""
    import jax

    data = np.load(path)
    p_def = jax.tree_util.tree_structure(params_template)
    o_def = jax.tree_util.tree_structure(opt_state_template)
    n_p = int(data["num_params"])
    n_o = int(data["num_opt"])
    params = jax.tree_util.tree_unflatten(
        p_def, [data[f"p{i}"] for i in range(n_p)])
    opt_state = jax.tree_util.tree_unflatten(
        o_def, [data[f"o{i}"] for i in range(n_o)])
    meta = {k[5:]: data[k] for k in data.files if k.startswith("meta_")}
    return params, opt_state, meta
