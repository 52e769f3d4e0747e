#!/usr/bin/env python3
"""Probe the whole-stem uint8 Pallas kernel on the real TPU.

The round-4 (final) stem attempt: preprocess + conv1_1 + conv1_2 +
pool1 in ONE kernel reading the raw uint8 image, so no large operand
crosses the XLA<->Pallas boundary (the split-stem variants lose ~10 ms
to operand copies of the 2.1 GB conv1_1 activation — see
ops/stem_pallas.py and docs/PERFORMANCE.md "Pallas fused-stem kernel").

Probes, in order:
  1. Does Mosaic on this libtpu compile the lane-unflatten reshape
     ``(36, 1536) -> (36, 256, 6)``? (Rejected on the round-2 runtime;
     this VM's rebuilt tunnel runs a Nov-2025 build.)
  2. Standalone stem timings at vgg512 b64: packed XLA stem (the
     shipping default) vs fused_stem_uint8 (dy-merged K=18 and
     nine-tap K=6 layouts) vs the split DMA kernel.
Each probe prints one line; failures print the exception head instead
of aborting the rest. Run during the post-training TPU window
(tools/post_v512.sh).
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MEAN = (104.0, 117.0, 123.0)


def probe_reshape():
    """Minimal kernel exercising the lane-unflatten reshape."""

    def kernel(x_ref, o_ref):
        x6 = x_ref[...].reshape(36, 256, 6)
        o_ref[...] = jnp.sum(x6, axis=2)

    x = jnp.ones((36, 1536), jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((36, 256), jnp.bfloat16),
    )(x)
    np.testing.assert_allclose(np.asarray(out, np.float32), 6.0)
    return "ok"


def main():
    print(f"backend: {jax.default_backend()}", flush=True)

    try:
        print(f"[1] lane-unflatten reshape: {probe_reshape()}", flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue
        msg = " ".join(str(e).split())[:300]
        print(f"[1] lane-unflatten reshape: FAIL {msg}", flush=True)
        print("[i] the uint8 kernel cannot run on this runtime", flush=True)

    from ssd_tensorflow_tpu.models.packed_conv import conv1_block_packed
    from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params
    from ssd_tensorflow_tpu.ops.stem_pallas import (
        fused_stem_pallas_dma,
        fused_stem_uint8,
    )
    from tools._timing import time_chained

    cfg = ModelConfig(preset_name="vgg512", num_classes=20)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params = {k: params[k] for k in ("conv1_1", "conv1_2")}
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 255, (64, 512, 512, 3), dtype=np.uint8)
    )

    def timed(name, fn):
        try:
            t = time_chained(
                lambda p, x: jnp.sum(fn(p, x).astype(jnp.float32)[:, :2, :2]),
                params, img,
            )
            print(f"[2] {name:>28}: {t * 1e3:7.2f} ms/b64", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = " ".join(str(e).split())[:300]
            print(f"[2] {name:>28}: FAIL {msg}", flush=True)

    timed("packed XLA stem",
          lambda p, x: conv1_block_packed(p, x, MEAN, "bfloat16"))
    timed("uint8 fused (K=18 merged)",
          lambda p, x: fused_stem_uint8(p, x, MEAN, "bfloat16"))
    timed("uint8 fused (9 taps K=6)",
          lambda p, x: fused_stem_uint8(p, x, MEAN, "bfloat16",
                                        nine_taps=True))
    timed("split DMA kernel",
          lambda p, x: fused_stem_pallas_dma(p, x, MEAN, "bfloat16"))


if __name__ == "__main__":
    main()
