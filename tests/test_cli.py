"""CLI-level integration tests (argument wiring, sample mode).

The heavy CLI paths (train/test modes) are covered through Trainer and
evaluate_model tests; these exercise the argparse -> config -> mode glue
the reference drives from ``train.py:145-301``.
"""

import os

import pytest

from nvae_tpu import cli

TINY_ARCH = [
    "--n_encoder_channels", "8", "--n_decoder_channels", "8",
    "--n_groups_per_scale", "1", "1", "--n_latent_per_group", "2",
    "--n_preprocess_blocks", "1", "--n_preprocess_cells", "2",
    "--n_postprocess_blocks", "1", "--n_postprocess_cells", "2",
]


@pytest.mark.slow
def test_sample_mode_annealed_schedule(tmp_path):
    """--scale_temperatures adds a t_annealed/ directory of PNGs on top of
    the reference's four fixed-temperature dirs (VERDICT r2 #8)."""
    argv = [
        "--mode", "sample", "--dataset", "synthetic", "--debug",
        "--batch_size", "4", "--n_samples", "4", "--seed", "0",
        *TINY_ARCH,
        "--model_save_dir", str(tmp_path / "models"),
        "--sample_dir", str(tmp_path / "results"),
        "--tensorboard_log_dir", str(tmp_path / "logs"),
        "--scale_temperatures", "0.6", "0.9",
    ]
    cli.main(argv)
    for t in ("t_0.7", "t_0.8", "t_0.9", "t_1.0", "t_annealed"):
        d = tmp_path / "results" / t
        pngs = [f for f in os.listdir(d) if f.endswith(".png")]
        assert len(pngs) == 4, f"{t}: {pngs}"


def test_scale_temperatures_length_validated(tmp_path):
    argv = [
        "--mode", "sample", "--dataset", "synthetic", "--debug",
        "--batch_size", "4", "--n_samples", "4",
        *TINY_ARCH,
        "--model_save_dir", str(tmp_path / "models"),
        "--sample_dir", str(tmp_path / "results"),
        "--tensorboard_log_dir", str(tmp_path / "logs"),
        "--scale_temperatures", "0.6", "0.9", "1.0",  # 3 values, 2 scales
    ]
    with pytest.raises(SystemExit, match="one value per decoder scale"):
        cli.main(argv)


def test_preset_flags_not_clobbered_by_defaults(tmp_path, monkeypatch):
    """Preset-set performance fields survive unset CLI flags (ADVICE r2):
    a preset enabling bf16/depthwise must not be silently reset by the
    argparse defaults.  Drives the real ``cli.main`` merge path and
    captures the ModelConfig handed to Trainer."""
    import dataclasses

    from nvae_tpu import presets

    base_model, base_train = presets.get_preset("mnist_step_sn")
    fast_model = dataclasses.replace(
        base_model,
        compute_dtype="bfloat16",
        bn_apply_dtype="bfloat16",
        postprocess_5x5_depthwise=True,
    )
    monkeypatch.setattr(
        presets, "get_preset", lambda name: (fast_model, base_train)
    )

    captured = {}

    class _StopEarly(Exception):
        pass

    import nvae_tpu.train.trainer as trainer_mod

    class _CapturingTrainer:
        def __init__(self, model_cfg, train_cfg, **kw):
            captured["model_cfg"] = model_cfg
            raise _StopEarly

    monkeypatch.setattr(trainer_mod, "Trainer", _CapturingTrainer)

    argv = [
        "--mode", "train", "--preset", "mnist_step_sn",
        "--dataset", "synthetic", "--debug",
        "--model_save_dir", str(tmp_path / "models"),
        "--sample_dir", str(tmp_path / "results"),
        "--tensorboard_log_dir", str(tmp_path / "logs"),
    ]
    with pytest.raises(_StopEarly):
        cli.main(argv)
    cfg = captured["model_cfg"]
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.bn_apply_dtype == "bfloat16"
    assert cfg.postprocess_5x5_depthwise is True
    # An explicit flag still overrides the preset.
    captured.clear()
    with pytest.raises(_StopEarly):
        cli.main(argv + ["--compute_dtype", "float32"])
    assert captured["model_cfg"].compute_dtype == "float32"
    assert captured["model_cfg"].bn_apply_dtype == "bfloat16"


def _serve_argv(tmp_path, extra):
    return [
        "--mode", "serve", "--dataset", "synthetic", "--debug",
        "--seed", "0", *TINY_ARCH,
        "--model_save_dir", str(tmp_path / "models"),
        "--sample_dir", str(tmp_path / "results"),
        "--tensorboard_log_dir", str(tmp_path / "logs"),
        *extra,
    ]


def test_serve_mode_wiring(tmp_path, monkeypatch):
    """--mode serve hands the HTTP layer a warmed (key_data, f32[B]) ->
    images sampler with the CLI's batch/host/port/delay knobs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nvae_tpu.serving_http as http_mod

    captured = {}

    def fake_serve(call_fn, batch_size, **kw):
        captured.update(call_fn=call_fn, batch_size=batch_size, **kw)

    monkeypatch.setattr(http_mod, "serve", fake_serve)
    cli.main(_serve_argv(tmp_path, [
        "--batch_size", "4", "--data_parallel", "1",
        "--serve_port", "8123", "--serve_max_delay_ms", "3",
        "--serve_dtype", "int8",
    ]))
    assert captured["batch_size"] == 4
    assert captured["port"] == 8123
    assert captured["max_delay_ms"] == 3.0
    kd = jax.random.key_data(jax.random.PRNGKey(2))
    t = jnp.full((4,), 0.8, jnp.float32)
    imgs = np.asarray(captured["call_fn"](kd, t))
    assert imgs.shape == (4, 32, 32, 1)
    # Deterministic: the batching runtime's replay guarantee holds.
    np.testing.assert_array_equal(imgs, np.asarray(captured["call_fn"](kd, t)))
    # Single-device serving is hot-reloadable (ReloadableSampler + the
    # checkpoint-dir reload hook) and reports its weights record.
    assert captured["reloader_factory"] is not None
    assert captured["call_fn"].info["serve_dtype"] == "int8"
    assert captured["call_fn"].info["step"] == 0


def test_serve_mode_uses_mesh_sampler(tmp_path, monkeypatch):
    """With a data mesh configured, serve mode shards the served batch's
    rows over the mesh (serving.build_mesh_sampler)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import nvae_tpu.serving as serving_mod
    import nvae_tpu.serving_http as http_mod

    captured = {}
    real_build = serving_mod.build_mesh_sampler

    def spy_build(*a, **kw):
        captured["mesh"] = a[3] if len(a) > 3 else kw["mesh"]
        return real_build(*a, **kw)

    monkeypatch.setattr(serving_mod, "build_mesh_sampler", spy_build)
    monkeypatch.setattr(
        http_mod, "serve",
        lambda call_fn, batch_size, **kw: captured.update(call_fn=call_fn),
    )
    # data_parallel defaults to 0 = all devices (8 virtual CPU devices).
    cli.main(_serve_argv(tmp_path, ["--batch_size", "8"]))
    assert captured["mesh"].shape["data"] == len(jax.devices())
    kd = jax.random.key_data(jax.random.PRNGKey(2))
    t_vec = jnp.linspace(0.6, 1.1, 8).astype(jnp.float32)
    assert np.asarray(captured["call_fn"](kd, t_vec)).shape == (8, 32, 32, 1)
