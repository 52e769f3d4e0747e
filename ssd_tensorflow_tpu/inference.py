"""Inference façade: load a trained model and run fused detection.

Used by the infer/detect CLIs and bench. The exported "frozen" artifact
is a single npz bundle of (params, model config, label map) — the
functional analog of the reference's frozen GraphDef
(export_model.py:62-72): everything needed to reconstruct the jitted
inference function, nothing else.
"""

from __future__ import annotations

import dataclasses
import json
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, apply_result, init_params
from ssd_tensorflow_tpu.ops.anchors import anchors_for_preset
from ssd_tensorflow_tpu.ops.postprocess import (
    DetectionConfig,
    decode_detections,
    decode_scores,
    detections_to_boxes,
)
from ssd_tensorflow_tpu.parallel.train_step import TrainConfig, make_train_state
from ssd_tensorflow_tpu.utils.checkpoint import checkpoint_config, restore_checkpoint


def model_config_from_dict(d: dict) -> ModelConfig:
    return ModelConfig(
        preset_name=d["preset_name"],
        num_classes=d["num_classes"],
        a_trous=d.get("a_trous", True),
        compute_dtype=d.get("compute_dtype", "bfloat16"),
        mean_bgr=tuple(d.get("mean_bgr", (104.0, 117.0, 123.0))),
        packed_stem=d.get("packed_stem", True),
        l2_norm_eps=d.get("l2_norm_eps", 1e-12),
    )


def model_config_to_dict(cfg: ModelConfig) -> dict:
    """The single serialization of ModelConfig (checkpoint configs,
    bundles, QAT checkpoints all use this — add new fields HERE).

    ``pallas_stem`` and ``padded_heads`` are deliberately NOT
    serialized: they select an execution backend/layout for the same
    math (like jit vs interpret), not a model property — a checkpoint
    must not pin its loader to a kernel choice. Benchmarks/CLIs opt in
    per run."""
    return {
        "preset_name": cfg.preset_name,
        "num_classes": cfg.num_classes,
        "a_trous": cfg.a_trous,
        "compute_dtype": cfg.compute_dtype,
        "mean_bgr": list(cfg.mean_bgr),
        "packed_stem": cfg.packed_stem,
        "l2_norm_eps": cfg.l2_norm_eps,
    }


def load_params_from_train_checkpoint(path: str):
    """Rebuild (params, model config, lid2name) from a training ckpt."""
    cfg = checkpoint_config(path)
    model_cfg = model_config_from_dict(cfg["model"])
    tc = cfg.get("train", {})
    train_cfg = TrainConfig(
        model=model_cfg,
        lr_values=tuple(tc.get("lr_values", (1e-3,))),
        lr_boundaries=tuple(tc.get("lr_boundaries", ())),
        momentum=tc.get("momentum", 0.9),
        weight_decay=tc.get("weight_decay", 0.0005),
    )
    template = make_train_state(
        init_params(jax.random.PRNGKey(0), model_cfg), train_cfg
    )
    state = restore_checkpoint(path, template)
    lid2name = {int(k): v for k, v in cfg.get("lid2name", {}).items()}
    return state.params, model_cfg, lid2name


def save_bundle(
    path: str,
    params,
    model_cfg: ModelConfig,
    lid2name=None,
    act_scales: dict | None = None,
):
    """Write the standalone inference bundle.

    With ``act_scales`` given, ``params`` must be the quantized param
    pytree from models/quantized.py and the bundle becomes an int8
    deploy artifact.
    """
    leaves, _ = jax.tree_util.tree_flatten(params)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    meta = {
        "model": model_config_to_dict(model_cfg),
        "lid2name": {str(k): v for k, v in (lid2name or {}).items()},
        "format": (
            "ssd_tensorflow_tpu.bundle.int8.v1"
            if act_scales is not None
            else "ssd_tensorflow_tpu.bundle.v1"
        ),
    }
    if act_scales is not None:
        meta["act_scales"] = {k: float(v) for k, v in act_scales.items()}
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_bundle(path: str):
    """Load (params, model config, lid2name[, act_scales]) from a bundle.

    Returns a 4-tuple; ``act_scales`` is None for float bundles.
    """
    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]))
        model_cfg = model_config_from_dict(meta["model"])
        quantized = meta.get("format", "").endswith("int8.v1")
        if quantized:
            from ssd_tensorflow_tpu.models.quantized import (
                _family_module,
                quantize_weights,
                quantize_weights_folded,
            )

            flt = init_params(jax.random.PRNGKey(0), model_cfg)
            # family int8 bundles fold per-channel activation scales
            # into the param pytree (quantized.quantize_weights_folded),
            # so their structural template differs from the VGG one
            template = (
                quantize_weights_folded(flt)
                if _family_module(model_cfg) is not None
                else quantize_weights(flt)
            )
        else:
            template = init_params(jax.random.PRNGKey(0), model_cfg)
        leaves, treedef = jax.tree_util.tree_flatten(template)
        loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
        params = jax.tree_util.tree_unflatten(treedef, loaded)
        lid2name = {int(k): v for k, v in meta.get("lid2name", {}).items()}
        act_scales = meta.get("act_scales") if quantized else None
    return params, model_cfg, lid2name, act_scales


def load_calibration_images(files, h: int, w: int) -> np.ndarray:
    """Decode + resize real calibration images to a uint8 (N,h,w,3) batch.

    The single loader shared by ``export_model.py --quantize`` (the
    shipped bundle) and ``bench.py`` (the on-the-spot quantized program),
    so the two can never silently calibrate through different
    preprocessing.
    """
    import cv2

    files = list(files)
    if not files:
        raise ValueError("no calibration images given")
    out = np.zeros((len(files), h, w, 3), dtype=np.uint8)
    for i, f in enumerate(files):
        img = cv2.imread(f)
        if img is None:
            raise ValueError(f"cannot read calibration image {f!r}")
        out[i] = cv2.resize(img, (w, h))
    return out


class InferenceModel:
    """Jitted end-to-end detector: uint8 BGR batch -> detections."""

    def __init__(self, params, model_cfg: ModelConfig, lid2name=None,
                 detection: DetectionConfig | None = None,
                 act_scales: dict | None = None,
                 overrides: dict | None = None,
                 mesh=None):
        if overrides:
            # execution-backend fields only (padded_heads, pallas_stem,
            # ...) — never serialized, opted into per run by CLIs/bench
            overrides = dict(overrides)
            if overrides.get("pallas_stem") and (
                act_scales is not None
                or model_cfg.compute_dtype != "bfloat16"
                or model_cfg.preset.backbone != "vgg"
            ):
                # the Pallas stem is a bf16 VGG-stem kernel: int8
                # bundles run their own quantized stem, f32 bundles the
                # f32 XLA stem, and the GN families have a different
                # conv1 block entirely — dropping the flag beats
                # crashing in ModelConfig.__post_init__ on a bundle the
                # user may not know the dtype/family of
                kind = (
                    "int8" if act_scales is not None
                    else model_cfg.preset.backbone
                    if model_cfg.preset.backbone != "vgg"
                    else model_cfg.compute_dtype
                )
                print(
                    f"[!] pallas_stem override ignored: this {kind} "
                    "bundle does not run the bf16 VGG float stem"
                )
                overrides.pop("pallas_stem")
            model_cfg = dataclasses.replace(model_cfg, **overrides)
        # Data-parallel serving: with a mesh, params are replicated on
        # every device and each batch shards its leading dim over the
        # 'data' axis — the whole fused program (preprocess + forward +
        # decode + NMS) is per-image, so XLA partitions it with zero
        # cross-device collectives and throughput scales linearly over
        # ICI-connected chips. Single-device behavior is unchanged when
        # mesh is None.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
            self.params = jax.device_put(
                params,
                jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, PartitionSpec()), params
                ),
            )
        else:
            self.params = jax.device_put(params)
        self.config = model_cfg
        self.preset = model_cfg.preset
        self.lid2name = lid2name or {}
        self.detection = detection or DetectionConfig(
            top_k=200, confidence_threshold=0.01
        )
        self.act_scales = act_scales
        self._anchors = jnp.asarray(anchors_for_preset(self.preset))

        if act_scales is not None:
            from ssd_tensorflow_tpu.models.quantized import (
                _forward,
                _forward_scores,
            )

            def fwd(params, images):
                return _forward(params, act_scales, images, model_cfg)

            def fwd_scores(params, images):
                return _forward_scores(params, act_scales, images, model_cfg)

        else:
            from ssd_tensorflow_tpu.models.ssd_vgg import apply_scores

            def fwd(params, images):
                return apply_result(params, images, model_cfg)

            def fwd_scores(params, images):
                return apply_scores(params, images, model_cfg)

        @partial(jax.jit, static_argnames=())
        def _run(params, images):
            result = fwd(params, images)
            probs = result[..., : model_cfg.num_classes + 1]
            locs = result[..., model_cfg.num_classes + 1 :]
            dets = decode_detections(probs, locs, self._anchors, self.detection)
            return result, dets

        # detection-only path: lazy softmax + cells-minor reductions —
        # never materializes the (B, A, K+5) result tensor (what
        # detect.py and bench run; `run` keeps the raw tensor for
        # --dump-predictions)
        @partial(jax.jit, static_argnames=())
        def _run_scores(params, images):
            conf, cls, locs = fwd_scores(params, images)
            return decode_scores(conf, cls, locs, self._anchors, self.detection)

        self._run = _run
        self._run_scores = _run_scores

    @classmethod
    def from_checkpoint(cls, path: str, **kw):
        params, cfg, lid2name = load_params_from_train_checkpoint(path)
        return cls(params, cfg, lid2name, **kw)

    @classmethod
    def from_bundle(cls, path: str, **kw):
        params, cfg, lid2name, act_scales = load_bundle(path)
        return cls(params, cfg, lid2name, act_scales=act_scales, **kw)

    def preprocess_files(self, files):
        """Load + resize images like the reference's sample_generator
        (infer.py:44-54): cv2 BGR, INTER_LINEAR to the preset size."""
        import cv2

        w, h = self.preset.image_size.w, self.preset.image_size.h
        out = np.zeros((len(files), h, w, 3), dtype=np.uint8)
        sizes = []
        for i, f in enumerate(files):
            img = cv2.imread(f)
            if img is None:
                raise FileNotFoundError(f)
            sizes.append((img.shape[1], img.shape[0]))
            out[i] = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        return out, sizes

    def _to_device(self, images):
        """Stage a uint8 batch; under a mesh, shard it over 'data'."""
        x = jnp.asarray(images)
        if self.mesh is not None:
            b, d = x.shape[0], self.mesh.shape["data"]
            if b % d:
                raise ValueError(
                    f"batch {b} not divisible by the data-parallel mesh "
                    f"size {d} — pad the batch (fixed shapes keep one "
                    "compiled program anyway, see cli/infer.py)"
                )
            x = jax.device_put(x, self._batch_sharding)
        return x

    def run(self, images: np.ndarray):
        """Run the fused forward+decode. ``images``: (B,H,W,3) uint8 BGR.

        Returns (raw result array (B,A,K+5), Detections).
        """
        result, dets = self._run(self.params, self._to_device(images))
        return result, dets

    def detect_boxes(self, images: np.ndarray):
        """Detections as host lists of (conf, Box) with label names.

        Runs the throughput scores path (no raw result tensor)."""
        dets = self._run_scores(self.params, self._to_device(images))
        return detections_to_boxes(dets, self.lid2name)
