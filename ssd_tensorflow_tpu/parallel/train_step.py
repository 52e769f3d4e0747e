"""Jitted, mesh-sharded train and eval steps.

One call = one optimizer step, entirely on device: ground-truth target
assignment (the reference did this per-image in Python workers,
transforms.py:57-114), forward, multibox loss, backward, SGD-momentum
update under a piecewise-constant LR schedule (train.py:43-47), and —
optionally — fused decode+NMS of the predictions so the host only ever
sees fixed-size detection tensors.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ssd_tensorflow_tpu.models.loss import l2_regularizer, multibox_loss
from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, apply_model
from ssd_tensorflow_tpu.ops.matching import encode_targets_batch
from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig, decode_detections
from ssd_tensorflow_tpu.parallel.sharding import param_shardings, replicated


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training configuration (hashable, jit-friendly)."""

    model: ModelConfig = ModelConfig()
    #: piecewise-constant LR (reference defaults train.py:69-72)
    lr_values: Tuple[float, ...] = (0.00075, 0.0001, 0.00001)
    lr_boundaries: Tuple[int, ...] = (320000, 400000)
    momentum: float = 0.9
    weight_decay: float = 0.0005
    #: detections decoded inside the step (None = skip)
    detect: Optional[DetectionConfig] = DetectionConfig(
        confidence_threshold=0.5
    )
    #: rematerialize the forward pass in the backward pass (memory for
    #: FLOPs — lets bigger per-chip batches fit in HBM)
    remat: bool = False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: tuple
    step: jax.Array


def lr_schedule(values, boundaries):
    """TF-style piecewise constant: values[i] for boundaries[i-1] < step
    <= boundaries[i] (train.py:43-47)."""
    values = jnp.asarray(values, jnp.float32)
    boundaries = jnp.asarray(boundaries, jnp.int32)

    def schedule(step):
        idx = jnp.searchsorted(boundaries, step, side="left")
        return values[idx]

    return schedule


def make_optimizer(cfg: TrainConfig):
    """SGD with momentum under the piecewise LR (ssdvgg.py:585-588)."""
    return optax.sgd(
        learning_rate=lr_schedule(cfg.lr_values, cfg.lr_boundaries),
        momentum=cfg.momentum,
    )


def make_train_state(params, cfg: TrainConfig, step: int = 0) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.asarray(step, jnp.int32),
    )


def _loss_and_aux(params, batch, anchors, cfg: TrainConfig, forward=None):
    mc = cfg.model
    labels = encode_targets_batch(
        batch["gt_boxes"],
        batch["gt_labels"],
        batch["gt_mask"],
        anchors,
        mc.num_classes,
    )
    labels = jax.lax.stop_gradient(labels)
    if forward is None:
        forward = lambda p, x: apply_model(p, x, mc)
    if cfg.remat:
        from ssd_tensorflow_tpu.parallel.remat import checkpoint_dots_only

        fwd = checkpoint_dots_only(forward)
        logits, locs = fwd(params, batch["images"])
    else:
        logits, locs = forward(params, batch["images"])
    losses = multibox_loss(logits, locs, labels, mc.num_classes)
    l2 = cfg.weight_decay * l2_regularizer(params)
    total = losses["confidence"] + losses["localization"] + l2
    aux = {
        "losses": {
            "total": total,
            "confidence": losses["confidence"],
            "localization": losses["localization"],
            "l2": l2,
        },
        "logits": logits,
        "locs": locs,
    }
    return total, aux


def _maybe_detect(aux, anchors, cfg: TrainConfig):
    if cfg.detect is None:
        return None
    probs = jax.nn.softmax(aux["logits"], axis=-1)
    return decode_detections(probs, aux["locs"], anchors, cfg.detect)


def make_train_step(
    cfg: TrainConfig, anchors, donate: bool = True, forward=None
):
    """Build the jitted train step.

    ``(state, batch) -> (state, losses, detections)`` where batch is a
    dict of ``images (B,H,W,3)``, ``gt_boxes (B,G,4)``,
    ``gt_labels (B,G)``, ``gt_mask (B,G)``. ``forward`` overrides the
    model forward pass ``(params, images) -> (logits, locs)`` (e.g. the
    fake-quant QAT forward, models/qat.py).

    Sharding follows the data ("computation follows data"): place the
    state with :func:`shard_state` and the batch with
    :func:`shard_batch` and XLA partitions the step over the mesh —
    gradients all-reduce over ICI, parameters stay replicated (or
    tensor-parallel when the rules in parallel/sharding.py are active).
    """
    tx = make_optimizer(cfg)
    anchors = jnp.asarray(anchors)

    def step_fn(state: TrainState, batch):
        grad_fn = jax.value_and_grad(_loss_and_aux, has_aux=True)
        (_, aux), grads = grad_fn(state.params, batch, anchors, cfg, forward)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        dets = _maybe_detect(aux, anchors, cfg)
        return new_state, aux["losses"], dets

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: TrainConfig, anchors, forward=None):
    """Build the jitted eval step: losses + detections, no update.

    ``forward`` overrides the model forward like in make_train_step (so
    QAT evaluation measures the fake-quant network it trains, not the
    float one)."""
    anchors_dev = jnp.asarray(anchors)

    def step_fn(params, batch):
        _, aux = _loss_and_aux(params, batch, anchors_dev, cfg, forward)
        dets = _maybe_detect(aux, anchors_dev, cfg)
        return aux["losses"], dets

    return jax.jit(step_fn)


def shard_state(state: TrainState, mesh, tensor_parallel: bool = False):
    """Place a TrainState on the mesh: params replicated (or TP per the
    sharding rules), optimizer state following the params, step replicated."""
    ps = param_shardings(mesh, state.params, tensor_parallel)
    params = jax.device_put(state.params, ps)

    rep = replicated(mesh)
    if tensor_parallel:
        # momentum buffers mirror their parameters' sharding
        opt_state = _shard_opt_like(state.opt_state, state.params, ps, rep)
    else:
        opt_state = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, rep), state.opt_state
        )
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jax.device_put(state.step, rep),
    )


def _shard_opt_like(opt_state, params, param_sh, rep):
    """Shard momentum buffers like their parameters (matched by shape —
    unambiguous because the TP-sharded layers have unique shapes)."""
    flat_ps = dict(
        zip(
            [tuple(p.shape) for p in jax.tree_util.tree_leaves(params)],
            jax.tree_util.tree_leaves(param_sh),
        )
    )

    def put(leaf):
        s = flat_ps.get(tuple(getattr(leaf, "shape", ())), rep)
        return jax.device_put(leaf, s)

    return jax.tree_util.tree_map(put, opt_state)


def shard_batch(batch, mesh):
    """Shard a host batch's leading dim over the mesh's data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(batch, NamedSharding(mesh, P("data")))
