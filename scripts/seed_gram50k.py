"""Seed the N=50000 north-star Gram memmap from the completed N=32768 one.

`examples/cifar_myrtle.py` draws its synthetic CIFAR stand-in as the leading
slice of one seeded stream (`load_images`: `RandomState(seed).rand(n, ...)`),
so the 32768 training images of the N=32768 run are exactly the first 32768
of the N=50000 run — and the finished 32k train Gram is the top-left
[:32768, :32768] square of the 50k one. With `--fused-block 512` the 32k
boundary is block-aligned (64 * 512), so 2080 of the 4851 upper-triangular
blocks in the 50k resume bitmap (~43% of the device time) can be marked done
by copying, saving ~5h of TPU time.

Usage: python scripts/seed_gram50k.py [src_dir] [dst_dir] [n_new] [n_old]
"""

import os
import sys

import numpy as np

BLOCK = 512


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.runs/gram32k"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.runs/gram50k"
    n_new = int(sys.argv[3]) if len(sys.argv) > 3 else 50000
    n_old = int(sys.argv[4]) if len(sys.argv) > 4 else 32768
    assert n_old % BLOCK == 0, "old size must be block-aligned"

    src_path = os.path.join(src, "gram_train.npy")
    src_done = np.load(src_path + ".done.npy")
    assert src_done.all(), f"source Gram incomplete: {src_done.sum()}/{len(src_done)}"
    old = np.lib.format.open_memmap(src_path, mode="r")
    assert old.shape == (n_old, n_old), old.shape

    os.makedirs(dst, exist_ok=True)
    dst_path = os.path.join(dst, "gram_train.npy")
    todo = [(i, j) for i in range(0, n_new, BLOCK)
            for j in range(i, n_new, BLOCK)]
    if os.path.exists(dst_path):
        raise SystemExit(f"{dst_path} already exists; refusing to overwrite")
    new = np.lib.format.open_memmap(dst_path, mode="w+", dtype=np.float32,
                                    shape=(n_new, n_new))
    chunk = 2048
    for r in range(0, n_old, chunk):
        new[r:r + chunk, :n_old] = old[r:r + chunk]
        new.flush()
        print(f"copied rows {r + chunk}/{n_old}", flush=True)

    done = np.zeros(len(todo), bool)
    for t, (i, j) in enumerate(todo):
        if i + BLOCK <= n_old and j + BLOCK <= n_old:
            done[t] = True
    np.save(dst_path + ".done.npy", done)
    print(f"seeded {int(done.sum())}/{len(todo)} blocks into {dst_path}")


if __name__ == "__main__":
    main()
