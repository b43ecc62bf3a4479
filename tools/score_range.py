"""Measure attention score ranges on a trained checkpoint.

Validates the FWD_UNSAFE_SOFTMAX assumption (intentbev/ops/flash_packed.py):
the fixed-max softmax is exact iff every pre-softmax score s = q.k/sqrt(d)
stays within the f32 exp range (|s| < ~88). Post-LN q/k at this model's
scale keep scores far inside that; this tool measures the actual per-call
extrema on a real checkpoint + real batch so the claim is empirical.

Usage (CPU is fine; the probe replaces the Pallas kernel with a blockwise
jnp reference, so no TPU is required):
  python tools/score_range.py --ckpt_dir runs/vit --data_dir .../val
"""

from __future__ import annotations

import argparse
import dataclasses

import jax

# Force CPU regardless of the axon TPU tunnel: the probe is pure jnp and
# must not contend with a training/bench run holding the chip. (The env
# var alone is not reliably honoured by the axon plugin — use the config.)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

_STATS: list[tuple[float, float]] = []


def _install_probe() -> None:
    from intentbev.ops import flash_packed

    def probed(q, k, v, num_heads, seq_len=None):
        b, t, dm = q.shape
        dh = dm // num_heads
        scale = 1.0 / (dh ** 0.5)
        qh = q.reshape(b, t, num_heads, dh).astype(jnp.float32)
        kh = k.reshape(b, t, num_heads, dh).astype(jnp.float32)
        vh = v.reshape(b, t, num_heads, dh).astype(jnp.float32)
        hi, lo = -np.inf, np.inf
        outs = []
        blk = 512
        for s0 in range(0, t, blk):
            s = jnp.einsum("bqhd,bkhd->bhqk", qh[:, s0:s0 + blk], kh) * scale
            hi = max(hi, float(jnp.max(s)))
            lo = min(lo, float(jnp.min(s)))
            p = jax.nn.softmax(s, axis=-1)
            outs.append(jnp.einsum("bhqk,bkhd->bqhd", p, vh))
        _STATS.append((lo, hi))
        print(f"  attention call {len(_STATS):2d}: score range "
              f"[{lo:+.2f}, {hi:+.2f}]", flush=True)
        o = jnp.concatenate(outs, axis=1)
        return o.reshape(b, t, dm).astype(q.dtype)

    flash_packed.flash_attention_packed = probed
    # models/vit.py does `from ..ops.flash_packed import flash_attention_packed`
    # inside __call__, so patching the module attribute is sufficient — on
    # TPU. On CPU the Attention module takes the BHTD multi_head_attention
    # branch instead (vit.py `use_flash and on_tpu`), so probe that too:

    def probed_bhtd(q, k, v, use_flash=True, kv_len=None):
        # q/k/v [B, H, T, D] -> same packed layout the flash probe expects
        b, h, t, dh = q.shape
        pack = lambda x: jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, h * dh)
        o = probed(pack(q), pack(k), pack(v), h, seq_len=kv_len)
        return jnp.transpose(o.reshape(b, t, h, dh), (0, 2, 1, 3))

    import intentbev.ops as ops_pkg
    from intentbev import models as models_pkg
    from intentbev.models import vit as vit_mod

    ops_pkg.multi_head_attention = probed_bhtd
    vit_mod.multi_head_attention = probed_bhtd  # imported at module top


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    from intentbev.bev.voxelize import dequantize_points, voxelize_packed
    from intentbev.checkpoint import load_checkpoint
    from intentbev.data.argoverse import (ArgoverseSampleLoader,
                                          ScenarioValidator,
                                          build_sequence_index)
    from intentbev.bev.rasterize import decode_map_transport
    from intentbev.data.pipeline import batch_iterator
    from intentbev.models import IntentNetViT

    state, cfg = load_checkpoint(args.ckpt_dir, step=args.step)
    vit_cfg = dataclasses.replace(cfg.vit, use_flash_attention=True)
    model = IntentNetViT(vit_cfg, cfg.heads, dtype=jnp.bfloat16)
    g = cfg.grid

    scenarios = ScenarioValidator(args.data_dir).find_valid_scenarios()
    sequences = build_sequence_index(scenarios, g.lidar_sweeps)
    loader = ArgoverseSampleLoader(g, max_gt=cfg.loss.max_gt_boxes,
                                   verbose=False)
    batch = next(iter(batch_iterator(sequences[: args.batch], loader,
                                     args.batch, num_workers=0)))
    pts = dequantize_points(jnp.asarray(batch.points))
    lidar = jax.vmap(lambda p, v: voxelize_packed(
        p, v, g, out_dtype=jnp.bfloat16))(pts, jnp.asarray(batch.points_valid))
    map_bev = decode_map_transport(jnp.asarray(batch.map_bev),
                                   g.map_channels, lidar.dtype)

    _install_probe()
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    out = model.apply(variables, lidar, map_bev)
    jax.block_until_ready(out)
    lo = min(s[0] for s in _STATS)
    hi = max(s[1] for s in _STATS)
    print(f"\nglobal score range over {len(_STATS)} attention calls: "
          f"[{lo:+.2f}, {hi:+.2f}]")
    margin = 88.0 - max(abs(lo), abs(hi))
    verdict = "SAFE" if margin > 20 else "MARGINAL" if margin > 0 else "UNSAFE"
    print(f"fixed-max softmax margin to the f32 exp range (+-88): "
          f"{margin:.1f} -> {verdict} for FWD_UNSAFE_SOFTMAX")


if __name__ == "__main__":
    main()
