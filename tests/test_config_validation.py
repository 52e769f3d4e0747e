"""Config-time validation: fail loudly at construction, not mid-jit.

Covers the round-3 hardening items: the Pallas-NMS/top_k contract
(ops/postprocess.py), the declarative augmentation schema
(data/pipeline.py), and the QAT l2_norm_eps plumbing (models/qat.py,
see the eps contract note in models/ssd_vgg.ModelConfig).
"""

import json
import os
import pickle

import pytest

from ssd_tensorflow_tpu.ops.postprocess import DetectionConfig


class TestDetectionConfigPallasNMS:
    def test_any_top_k_accepted_with_pallas(self):
        # the kernel lane-pads internally (ops/nms_pallas.py), so the
        # reference's default cap of 200 works with the Pallas path
        cfg = DetectionConfig(top_k=200, use_pallas_nms=True)
        assert cfg.top_k == 200

    def test_top_k_multiple_of_128_ok(self):
        cfg = DetectionConfig(top_k=256, use_pallas_nms=True)
        assert cfg.top_k == 256

    def test_default_config_unaffected(self):
        assert DetectionConfig().top_k == 200


class TestAugmentationSchema:
    def test_unknown_key_rejected(self):
        from ssd_tensorflow_tpu.data.pipeline import (
            validate_augmentation_config,
        )

        with pytest.raises(ValueError, match="expand_probabilty"):
            validate_augmentation_config(
                {"sampler_trials": 10, "expand_probabilty": 0.5}, "test"
            )

    def test_known_keys_pass(self):
        from ssd_tensorflow_tpu.data.pipeline import (
            validate_augmentation_config,
        )

        aug = {"sampler_trials": 10, "expand_probability": 0.25}
        assert validate_augmentation_config(aug, "test") is aug

    def test_training_data_rejects_bad_artifact(self, tmp_path):
        from ssd_tensorflow_tpu.data.pipeline import TrainingData
        from ssd_tensorflow_tpu.presets import (
            get_preset_by_name,
            preset_to_dict,
        )

        artifact = {
            "preset": preset_to_dict(get_preset_by_name("test64")),
            "num-classes": 2,
            "colors": {},
            "lid2name": {},
            "lname2id": {},
            "augmentation": {"samplr_trials": 5},  # typo'd key
        }
        with open(tmp_path / "training-data.json", "w") as f:
            json.dump(artifact, f)
        for name in ("train-samples.pkl", "valid-samples.pkl"):
            with open(tmp_path / name, "wb") as f:
                pickle.dump([], f)
        with pytest.raises(ValueError, match="samplr_trials"):
            TrainingData(str(tmp_path))

    def test_augment_config_for_rejects_unknown(self):
        from ssd_tensorflow_tpu.data.device_augment import augment_config_for
        from ssd_tensorflow_tpu.presets import get_preset_by_name

        with pytest.raises(ValueError, match="min_jaccard"):
            augment_config_for(
                get_preset_by_name("test64"), {"min_jaccard": 0.3}
            )


class TestQATEpsContract:
    def test_l2_norm_eps_round_trips(self):
        from ssd_tensorflow_tpu.inference import (
            model_config_from_dict,
            model_config_to_dict,
        )
        from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig

        cfg = ModelConfig(preset_name="test64", l2_norm_eps=1e-3)
        assert model_config_from_dict(model_config_to_dict(cfg)) == cfg
        # old artifacts without the field load with the float default
        d = model_config_to_dict(cfg)
        del d["l2_norm_eps"]
        assert model_config_from_dict(d).l2_norm_eps == 1e-12

    def test_qat_forward_rejects_tiny_eps(self):
        from ssd_tensorflow_tpu.models.qat import make_qat_forward
        from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig

        cfg = ModelConfig(preset_name="test64", compute_dtype="float32")
        with pytest.raises(ValueError, match="l2_norm_eps"):
            make_qat_forward(cfg, {"conv1_1": 1.0})

    def test_qat_deploy_uses_trained_eps(self):
        """The int8 deploy forward of a QAT config must normalize with
        the QAT eps (the round-2 advisor's train/deploy mismatch)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ssd_tensorflow_tpu.models.qat import qat_apply_model
        from ssd_tensorflow_tpu.models.quantized import (
            QuantizedModel,
        )
        from ssd_tensorflow_tpu.models.ssd_vgg import (
            ModelConfig,
            init_params,
        )

        cfg = ModelConfig(
            preset_name="test64",
            num_classes=2,
            compute_dtype="float32",
            packed_stem=False,
            l2_norm_eps=1e-3,
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
        )
        qm = QuantizedModel(params, cfg, images, percentile=100.0)
        logits, locs = qat_apply_model(params, images, cfg, qm.act_scales)
        result = qm.result(images)
        q_logits_softmax = result[..., : cfg.num_classes + 1]
        ref = jax.nn.softmax(logits, axis=-1)
        # same quantizer, same eps: int8 vs fake-quant differ only by
        # accumulator rounding
        np.testing.assert_allclose(
            np.asarray(q_logits_softmax), np.asarray(ref), atol=0.08
        )


class TestInferenceOverrideGuard:
    """Backend overrides must degrade, not crash, on incompatible bundles.

    detect.py/infer.py/bench.py pass --pallas-stem as an InferenceModel
    override; the bundle's config may be int8 or float32, where the bf16
    stem kernel cannot run — the override is dropped with a message
    instead of tripping ModelConfig.__post_init__ (round-3 review)."""

    def _make(self, compute_dtype, overrides, act_scales=None):
        import jax

        from ssd_tensorflow_tpu.inference import InferenceModel
        from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params

        cfg = ModelConfig(
            preset_name="test64", num_classes=2, compute_dtype=compute_dtype
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        return InferenceModel(
            params, cfg, act_scales=act_scales, overrides=overrides
        )

    def test_pallas_stem_dropped_on_float32_bundle(self, capsys):
        model = self._make("float32", {"pallas_stem": True})
        assert model.config.pallas_stem is False
        assert "pallas_stem override ignored" in capsys.readouterr().out

    def test_pallas_stem_dropped_on_family_bundle(self, capsys):
        # a bf16 GN-family bundle has no VGG stem at all — the flag is
        # dropped with the family named, not a ModelConfig ValueError
        import jax

        from ssd_tensorflow_tpu.inference import InferenceModel
        from ssd_tensorflow_tpu.models.ssd_vgg import ModelConfig, init_params

        cfg = ModelConfig(
            preset_name="rtest64", num_classes=2, compute_dtype="bfloat16"
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        model = InferenceModel(params, cfg, overrides={"pallas_stem": True})
        assert model.config.pallas_stem is False
        assert "resnet" in capsys.readouterr().out

    def test_pallas_stem_dropped_on_int8_bundle(self, capsys):
        # act_scales marks a quantized bundle; construction must not
        # raise even though the config is bf16-incompatible with the flag
        model = self._make(
            "float32", {"pallas_stem": True}, act_scales={"conv1_1": 1.0}
        )
        assert model.config.pallas_stem is False
        assert "int8" in capsys.readouterr().out

    def test_other_overrides_still_apply(self):
        model = self._make(
            "float32", {"pallas_stem": True, "padded_heads": True}
        )
        assert model.config.padded_heads is True

    def test_pallas_stem_kept_on_bf16_bundle(self):
        model = self._make("bfloat16", {"pallas_stem": True})
        assert model.config.pallas_stem is True
