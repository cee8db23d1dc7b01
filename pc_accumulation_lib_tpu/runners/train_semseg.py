"""Semantic-segmentation training entry point.

The reference consumes a frozen ONNX checkpoint it cannot produce; a
complete framework needs the training side too. Trains the Flax ResNet-50
FCN (models/train.py) on (image, label) pairs over a ('data','model') DP/TP
mesh, with orbax checkpointing.

Data format: .npz shards with arrays ``images`` (N,H,W,3) uint8 and
``labels`` (N,H,W) int (255 = ignore), e.g. produced by projecting KITTI-360
3D semantic GT into the camera.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def iterate_batches(shard_paths, batch_size, seed=0):
    rng = np.random.default_rng(seed)
    order = list(shard_paths)
    while True:
        rng.shuffle(order)
        for path in order:
            with np.load(path) as d:
                images, labels = d['images'], d['labels']
            idx = rng.permutation(images.shape[0])
            for i in range(0, len(idx) - batch_size + 1, batch_size):
                sel = idx[i:i + batch_size]
                yield images[sel], labels[sel]


def run(data_glob: str, steps: int = 1000, batch_size: int = 8,
        lr: float = 1e-3, ckpt_dir: str = 'semseg_ckpt',
        ckpt_every: int = 500, dp: int = None, seed: int = 0,
        stage_sizes=None, log_every: int = 50):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pc_accumulation_lib_tpu.models import checkpoint as ckpt
    from pc_accumulation_lib_tpu.models import train as train_mod

    shards = sorted(glob.glob(data_glob))
    if not shards:
        raise FileNotFoundError(f'no training shards match {data_glob!r}')
    with np.load(shards[0]) as d:
        hw = d['images'].shape[1:3]

    devs = np.array(jax.devices())
    n = devs.size
    dp = dp or (n if n % 2 else n // 2)
    mesh = Mesh(devs.reshape(dp, n // dp), ('data', 'model'))
    state, train_step = train_mod.make_train_setup(
        mesh, lr=lr, img_hw=tuple(hw), seed=seed, stage_sizes=stage_sizes)

    it = iterate_batches(shards, batch_size, seed)
    losses = []
    for step_i in range(1, steps + 1):
        images, labels = next(it)
        state, loss = train_step(state,
                                 jnp.asarray(images, jnp.float32),
                                 jnp.asarray(labels, jnp.int32))
        losses.append(float(loss))
        if step_i % log_every == 0:
            print(f'step {step_i} | loss {np.mean(losses[-log_every:]):.4f}')
        if ckpt_every and step_i % ckpt_every == 0:
            ckpt.save_train_state(ckpt_dir, step_i, state)
    if ckpt_every:
        ckpt.save_train_state(ckpt_dir, steps, state)
    return state, losses


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument('data_glob', type=str,
                        help="e.g. 'semseg_data/*.npz'")
    parser.add_argument('--steps', type=int, default=1000)
    parser.add_argument('--batch_size', type=int, default=8)
    parser.add_argument('--lr', type=float, default=1e-3)
    parser.add_argument('--ckpt_dir', type=str, default='semseg_ckpt')
    parser.add_argument('--ckpt_every', type=int, default=500)
    parser.add_argument('--dp', type=int, default=None,
                        help='data-parallel axis size (rest goes to TP)')
    args = parser.parse_args(argv)
    run(args.data_glob, args.steps, args.batch_size, args.lr,
        args.ckpt_dir, args.ckpt_every, args.dp)


if __name__ == '__main__':
    main()
