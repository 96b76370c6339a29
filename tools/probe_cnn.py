"""
Probe menu for the IL policy CNN cost inside a scan (the config-4 profile
showed the tiny CNN at ~0.8 ms/step vs ~0.08 ms for render+dynamics).

Each variant scans 40 policy applications whose input depends on the carry
(so nothing hoists), timed as same-process deltas vs an empty scan.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tds_tpu_jax_cache")

from torchdrivesim_tpu.benchmark import sync_pin
from torchdrivesim_tpu.models import BirdviewCNNPolicy

B, RES, H = 16, 64, 40
REPS = 20


def timed(name, fn, *args):
    for _ in range(3):
        out = fn(*args)
        float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt * 1000:8.3f} ms/rollout", flush=True)
    return dt


def scan_of(apply_fn, params):
    def run(params, x0):
        def body(x, _):
            act = apply_fn(params, x)                    # (B, 2)
            x = x + act.sum() * 1e-6                     # carry depends on act
            return x, None
        x, _ = jax.lax.scan(body, x0, None, length=H)
        return x.sum()
    return jax.jit(run)


def main():
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(rng, (B, 3, RES, RES)) * 255.0

    variants = {}

    pol = BirdviewCNNPolicy(action_size=2, features=(16, 32))
    p = pol.init(rng, jnp.zeros((1, 3, RES, RES)))
    variants["flax bf16 (16,32) baseline"] = (scan_of(pol.apply, p), p)

    pol32 = BirdviewCNNPolicy(action_size=2, features=(16, 32),
                              dtype=jnp.float32)
    p32 = pol32.init(rng, jnp.zeros((1, 3, RES, RES)))
    variants["flax f32 (16,32)"] = (scan_of(pol32.apply, p32), p32)

    pol_big = BirdviewCNNPolicy(action_size=2, features=(128, 128))
    pbig = pol_big.init(rng, jnp.zeros((1, 3, RES, RES)))
    variants["flax bf16 (128,128)"] = (scan_of(pol_big.apply, pbig), pbig)

    # space-to-depth formulation: 4x4 patches -> dense matmuls only
    def s2d_init(feats=(128, 128), key=rng):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        w1 = jax.random.normal(k1, (4 * 4 * 3, feats[0]), jnp.bfloat16) * 0.05
        w2 = jax.random.normal(k2, (2 * 2 * feats[0], feats[1]),
                               jnp.bfloat16) * 0.05
        w3 = jax.random.normal(k3, (feats[1], 128), jnp.bfloat16) * 0.05
        w4 = jax.random.normal(k4, (128, 2), jnp.float32) * 0.05
        return dict(w1=w1, w2=w2, w3=w3, w4=w4)

    def s2d_apply(params, image):
        x = jnp.transpose(image, (0, 2, 3, 1)) / 255.0     # NHWC
        b, h, w, c = x.shape
        x = x.reshape(b, h // 4, 4, w // 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 4, w // 4, 4 * 4 * c).astype(jnp.bfloat16)
        x = jax.nn.relu(x @ params["w1"])                  # (B,16,16,F0)
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h // 2, w // 2, 2 * 2 * c)
        x = jax.nn.relu(x @ params["w2"])                  # (B,8,8,F1)
        x = x.mean(axis=(1, 2))
        x = jax.nn.relu(x @ params["w3"]).astype(jnp.float32)
        return jnp.tanh(x @ params["w4"])

    ps2d = s2d_init()
    variants["s2d matmul bf16 (128,128)"] = (scan_of(s2d_apply, ps2d), ps2d)

    ps2d_small = s2d_init(feats=(48, 128))
    variants["s2d matmul bf16 (48,128)"] = (
        scan_of(partial(s2d_apply), ps2d_small), ps2d_small)

    sync_pin()
    base = timed("empty scan", jax.jit(
        lambda x: jax.lax.scan(lambda c, _: (c * 1.0000001, None), x, None,
                               length=H)[0].sum()), x0)
    for name, (fn, p_) in variants.items():
        timed(name, fn, p_, x0)
    print(f"(empty-scan floor {base * 1000:.3f} ms)")


if __name__ == "__main__":
    main()
