"""The NVAE model: hierarchical VAE with bidirectional encoder/decoder towers.

A ground-up Flax implementation of the reference architecture
(``models.py`` / ``preprocess.py`` / ``encoder.py`` / ``decoder.py`` /
``postprocess.py``), organized functionally:

- The encoder returns the list of per-group feature maps (bottom-up) plus the
  trunk; the reference instead captures ``partial(combiner, x)`` closures
  (``encoder.py:70-83``) — impossible and unnecessary under jit.  The
  enc-dec combiner convolutions live in the decoder, which consumes the
  (reversed, i.e. top-down) feature list.
- RNG is threaded explicitly via Flax rng collections (``"sample"``), replacing
  the reference's hidden-global ``tf.random`` draws (``common.py:67``).
- All shapes are static, derived from :class:`nvae_tpu.config.ModelConfig`.

Architecture trace for the default MNIST config (SURVEY §3.1):
input 32x32x1 -> preprocess 16x16x64 -> 8x8x128 -> encoder scale 0 (5 groups @
8x8x128) -> down -> scale 1 (10 groups @ 4x4x256) -> trunk 4x4x256 -> decoder:
z0 4x4x20, 10 groups @ 4x4x256 -> up -> 5 groups @ 8x8x128 -> postprocess
16x16x64 -> 32x32x32 -> likelihood head 32x32x1 (Bernoulli logits).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nvae_tpu.config import ModelConfig
from nvae_tpu.nn.blocks import (
    DecoderSampleCombiner,
    EncDecCombiner,
    EncoderResidualCell,
    GenerativeResidualCell,
    PostprocessCell,
    Rescaler,
    SNConv,
    StemCell,
)
from nvae_tpu.ops import gaussian_log_prob, softclamp5

SIGMA_FLOOR = 1e-2  # added to every exp(softclamp5(log_sigma)) head, parity
# with reference common.py:86,95,98 and models.py:142.


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LatentParams:
    """Posterior/prior parameters of one latent group (reference
    ``DistributionParams``, ``common.py:12-17``)."""

    enc_mu: jax.Array
    enc_sigma: jax.Array
    dec_mu: jax.Array
    dec_sigma: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ForwardOutput:
    """Everything the loss/eval layers need from one forward pass."""

    logits: jax.Array  # likelihood-head parameters, (B, H, W, C_out)
    latents: List[LatentParams]  # one per group, top-down order
    log_p: jax.Array  # (B,) sum of prior log-densities (0 unless nll)
    log_q: jax.Array  # (B,) sum of posterior log-densities (0 unless nll)


def _sigma(log_sigma_raw: jax.Array) -> jax.Array:
    return jnp.exp(softclamp5(log_sigma_raw)) + SIGMA_FLOOR


def _maybe_remat(cls, cfg: ModelConfig):
    """Wrap a cell class with jax.checkpoint when cfg.remat is set — the
    activation-memory lever the eager reference has no analog of."""
    # static_argnums=(2,): the `train` flag of cell __call__(self, x, train)
    # is python control flow, not a traced value.
    return nn.remat(cls, static_argnums=(2,)) if cfg.remat else cls


class _Preprocess(nn.Module):
    """Input map ``2x - 1``, stem conv, then n_blocks x (n_cells-1 stride-1 +
    1 stride-2 doubling) stem cells (reference ``preprocess.py:7-39``)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        x = 2.0 * x - 1.0
        x = SNConv(
            cfg.n_encoder_channels, (3, 3), mode=cfg.spectral_mode,
            dtype=jnp.dtype(cfg.compute_dtype),
        )(x, train)
        mult = 1
        for _ in range(cfg.n_preprocess_blocks):
            for _ in range(cfg.n_preprocess_cells - 1):
                x = _maybe_remat(StemCell, cfg)(
                    mult * cfg.n_encoder_channels, n_nodes=2, downsample=False,
                    se_ratio=cfg.se_ratio, mode=cfg.spectral_mode,
                    bn_dtype=jnp.dtype(cfg.bn_apply_dtype),
                    dtype=jnp.dtype(cfg.compute_dtype),
                )(x, train)
            mult *= cfg.scale_factor
            x = _maybe_remat(StemCell, cfg)(
                mult * cfg.n_encoder_channels, n_nodes=2, downsample=True,
                se_ratio=cfg.se_ratio, mode=cfg.spectral_mode,
                bn_dtype=jnp.dtype(cfg.bn_apply_dtype),
                dtype=jnp.dtype(cfg.compute_dtype),
            )(x, train)
        return x


class _Encoder(nn.Module):
    """Bottom-up tower (reference ``encoder.py:19-83``).

    Returns ``(group_features, trunk)`` where ``group_features[i]`` is the
    feature map at the i-th combiner point, bottom-up — the data the reference
    captures via closures.  There are ``n_total_groups - 1`` combiner points
    (no combiner after the final group, reference ``encoder.py:43-45``).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[List[jax.Array], jax.Array]:
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        shapes = cfg.shapes()
        feats: List[jax.Array] = []
        n_scales = cfg.n_latent_scales
        for scale in range(n_scales):
            channels = shapes.enc_scale_channels[scale]
            n_groups = cfg.n_groups_per_scale[scale]
            for group in range(n_groups):
                for _ in range(cfg.res_cells_per_group):
                    x = _maybe_remat(EncoderResidualCell, cfg)(
                        channels, se_ratio=cfg.se_ratio,
                        mode=cfg.spectral_mode,
                        bn_dtype=jnp.dtype(cfg.bn_apply_dtype), dtype=dt,
                    )(x, train)
                is_last = scale == n_scales - 1 and group == n_groups - 1
                if not is_last:
                    feats.append(x)
            if scale < n_scales - 1:
                x = Rescaler(
                    shapes.enc_scale_channels[scale + 1], cfg.scale_factor,
                    up=False, mode=cfg.spectral_mode,
                    bn_dtype=jnp.dtype(cfg.bn_apply_dtype), dtype=dt,
                )(x, train)
        # Trunk head: ELU -> 1x1 conv -> ELU (reference encoder.py:58-66).
        trunk = jax.nn.elu(x)
        trunk = SNConv(
            shapes.base_channels_enc, (1, 1), mode=cfg.spectral_mode, dtype=dt
        )(trunk, train)
        trunk = jax.nn.elu(trunk)
        return feats, trunk


class _LatentHeads(nn.Module):
    """Per-group posterior/prior parameter heads (reference ``Sampler``,
    ``common.py:20-102``).

    - ``enc_head[g]``: 3x3 conv -> 2*n_latent channels, consumed for the
      posterior (offsets for g>0).
    - ``dec_head[g]`` (g>0): ELU -> 1x1 conv -> 2*n_latent channels for the
      prior.  Group 0's prior is standard normal.

    This module only produces distribution parameters; sampling happens in the
    decoder where the rng lives.  Unlike reference ``common.py:73`` there is
    no ``squeeze`` — batch size 1 works.
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        n_out = 2 * cfg.n_latent_per_group
        self.enc_heads = [
            SNConv(n_out, (3, 3), mode=cfg.spectral_mode, dtype=dt)
            for _ in range(cfg.n_total_groups)
        ]
        self.dec_heads = [
            SNConv(n_out, (1, 1), mode=cfg.spectral_mode, dtype=dt)
            for _ in range(cfg.n_total_groups - 1)
        ]

    def enc_params(
        self, group: int, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        # fp32 regardless of compute dtype: mu/log-sigma feed softclamp/exp/KL.
        out = self.enc_heads[group](x, train).astype(jnp.float32)
        return jnp.split(out, 2, axis=-1)

    def dec_params(
        self, group: int, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        assert group >= 1
        out = self.dec_heads[group - 1](jax.nn.elu(x), train).astype(jnp.float32)
        return jnp.split(out, 2, axis=-1)


class _Decoder(nn.Module):
    """Top-down tower (reference ``decoder.py:9-104``) owning the latent
    heads, the trainable constant ``h``, and the enc-dec combiners."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.heads = _LatentHeads(cfg)
        shapes = cfg.shapes()
        dt = jnp.dtype(cfg.compute_dtype)
        groups_topdown = tuple(reversed(cfg.n_groups_per_scale))
        # Encoder-side channel count at each decoder (top-down) scale — the
        # enc-dec merge outputs encoder channels (reference encoder.py:38,45).
        enc_ch_topdown = tuple(reversed(shapes.enc_scale_channels))
        cells, combiners, merges, rescalers = [], [], [], []
        g_idx = 0
        for scale in range(cfg.n_latent_scales):
            channels = shapes.dec_scale_channels[scale]
            for group in range(groups_topdown[scale]):
                cells.append(
                    tuple(
                        _maybe_remat(GenerativeResidualCell, cfg)(
                            channels, expansion_ratio=cfg.expansion_ratio,
                            se_ratio=cfg.se_ratio,
                            use_pallas=cfg.use_pallas_kernels,
                            mode=cfg.spectral_mode,
                            bn_dtype=jnp.dtype(cfg.bn_apply_dtype), dtype=dt,
                        )
                        for _ in range(cfg.res_cells_per_group)
                    )
                    if not (scale == 0 and group == 0)
                    else tuple()
                )
                combiners.append(
                    DecoderSampleCombiner(
                        channels, mode=cfg.spectral_mode, dtype=dt
                    )
                )
                # merges[g-1] serves decoder group g, so it is created at
                # group g's scale with that scale's encoder channels.
                if g_idx >= 1:
                    merges.append(
                        EncDecCombiner(
                            enc_ch_topdown[scale], mode=cfg.spectral_mode,
                            dtype=dt,
                        )
                    )
                g_idx += 1
            if scale < cfg.n_latent_scales - 1:
                rescalers.append(
                    Rescaler(
                        shapes.dec_scale_channels[scale + 1], cfg.scale_factor,
                        up=True, mode=cfg.spectral_mode,
                        bn_dtype=jnp.dtype(cfg.bn_apply_dtype), dtype=dt,
                    )
                )
        self.cells = cells
        self.combiners = combiners
        self.merges = merges
        self.rescalers = rescalers
        self.groups_topdown = groups_topdown
        self.h = self.param(
            "h",
            nn.initializers.uniform(scale=1.0),
            (shapes.base_size, shapes.base_size, cfg.n_decoder_channels),
        )

    def _plan(self):
        """Static iteration plan: for each group index, (scale, cells, merge?,
        rescale-after?)."""
        plan = []
        g_idx = 0
        for scale in range(self.cfg.n_latent_scales):
            for group in range(self.groups_topdown[scale]):
                rescale_after = (
                    scale < self.cfg.n_latent_scales - 1
                    and group == self.groups_topdown[scale] - 1
                )
                plan.append((scale, g_idx, rescale_after))
                g_idx += 1
        return plan

    def __call__(
        self,
        trunk: jax.Array,
        enc_feats_topdown: Optional[List[jax.Array]],
        train: bool = False,
        nll: bool = False,
    ) -> Tuple[jax.Array, List[LatentParams], jax.Array, jax.Array]:
        """Posterior pass: sample every z from q, produce likelihood features.

        ``enc_feats_topdown`` is the reversed encoder feature list (the
        reference reverses at ``models.py:93``).
        """
        cfg = self.cfg
        batch = trunk.shape[0]
        latents: List[LatentParams] = []
        log_p = jnp.zeros((batch,))
        log_q = jnp.zeros((batch,))

        # Group 0: posterior from trunk, standard-normal prior
        # (reference common.py:83-91).
        mu_off, ls_off = self.heads.enc_params(0, trunk, train)
        enc_mu = softclamp5(mu_off)
        enc_sigma = _sigma(ls_off)
        eps = jax.random.normal(self.make_rng("sample"), enc_mu.shape)
        z = enc_mu + eps * enc_sigma
        params = LatentParams(
            enc_mu, enc_sigma, jnp.zeros_like(enc_mu), jnp.ones_like(enc_sigma)
        )
        latents.append(params)
        if nll:
            log_q += jnp.sum(
                gaussian_log_prob(z, enc_mu, enc_sigma), axis=(1, 2, 3)
            )
            log_p += jnp.sum(
                gaussian_log_prob(z, params.dec_mu, params.dec_sigma),
                axis=(1, 2, 3),
            )

        x = jnp.tile(self.h[None], (batch, 1, 1, 1))
        x = self.combiners[0](x, z, train)

        rescale_i = 0
        plan = self._plan()
        if plan[0][2]:  # scale 0 has a single group: rescale right after it
            x = self.rescalers[rescale_i](x, train)
            rescale_i += 1
        for scale, g_idx, rescale_after in plan[1:]:
            for cell in self.cells[g_idx]:
                x = cell(x, train)
            # Bidirectional merge with the encoder feature
            # (reference decoder.py:80).
            enc_prior = self.merges[g_idx - 1](
                enc_feats_topdown[g_idx - 1], x, train
            )
            # Residual posterior (reference common.py:92-102).
            raw_dec_mu, raw_dec_ls = self.heads.dec_params(g_idx, x, train)
            dec_mu = softclamp5(raw_dec_mu)
            dec_sigma = _sigma(raw_dec_ls)
            mu_off, ls_off = self.heads.enc_params(g_idx, enc_prior, train)
            enc_mu = softclamp5(raw_dec_mu + mu_off)
            enc_sigma = _sigma(raw_dec_ls + ls_off)
            eps = jax.random.normal(self.make_rng("sample"), enc_mu.shape)
            z = enc_mu + eps * enc_sigma
            params = LatentParams(enc_mu, enc_sigma, dec_mu, dec_sigma)
            latents.append(params)
            if nll:
                log_q += jnp.sum(
                    gaussian_log_prob(z, enc_mu, enc_sigma), axis=(1, 2, 3)
                )
                log_p += jnp.sum(
                    gaussian_log_prob(z, dec_mu, dec_sigma), axis=(1, 2, 3)
                )
            x = self.combiners[g_idx](x, z, train)
            if rescale_after:
                x = self.rescalers[rescale_i](x, train)
                rescale_i += 1
        return x, latents, log_p, log_q

    def generate(
        self,
        n_samples: int,
        temperature: float = 1.0,
        train: bool = False,
        return_interp_state: bool = False,
        scale_temperatures: Optional[Tuple[float, ...]] = None,
    ):
        """Prior (unconditional) pass (reference ``models.py:137-178``).

        Temperature parity: multiplies sigma only for z0 unless
        ``cfg.temperature_all_groups`` (the reference samples deeper groups at
        T=1, SURVEY §3.3).  ``scale_temperatures`` — one value per decoder
        scale, top-down — enables *annealed* sampling: every group in scale s
        samples at ``scale_temperatures[s]`` (the multi-scale sampling control
        the CelebA configuration calls for; overrides ``temperature``).

        Both temperature controls also accept a **per-sample** batch axis
        (beyond the reference, which samples one scalar T per call,
        models.py:137): ``temperature`` of shape ``(n_samples,)`` or
        ``scale_temperatures`` of shape ``(n_scales, n_samples)`` give every
        row of the batch its own temperature.  One dispatch then serves a
        whole temperature sweep — the sequential 15-group decoder chain is
        latency-bound at small batches (README ladder: 4x the rows is ~3x
        the throughput), so batching the sweep beats per-T calls.

        Returns ``(features, last_s, z1, z2)`` where ``last_s`` is the input
        to the final group's combiner and ``z1``/``z2`` are two extra draws
        from the final group's prior — the state PPL's slerp interpolation
        needs (reference ``models.py:175-178``).
        """
        cfg = self.cfg
        shapes = cfg.shapes()
        if scale_temperatures is not None:
            assert len(scale_temperatures) == cfg.n_latent_scales
            scale_temperatures = jnp.asarray(scale_temperatures, jnp.float32)
            if scale_temperatures.ndim == 2:  # (n_scales, n_samples)
                assert scale_temperatures.shape[1] == n_samples
                scale_temperatures = scale_temperatures[:, :, None, None, None]
        # Temperature is a TRACED scalar: one compiled program serves every
        # temperature (the eval protocol sweeps {0.6, 0.8, 1.0} and the image
        # hooks {0.7, 0.8, 0.9, 1.0} — per-temperature recompiles would cost
        # minutes each on remote devices).
        t_scalar = jnp.asarray(temperature, jnp.float32)
        if t_scalar.ndim == 1:  # per-sample: broadcast over (B, H, W, C)
            assert t_scalar.shape[0] == n_samples
            t_scalar = t_scalar[:, None, None, None]

        def group_temp(scale: int, g_idx: int):
            if scale_temperatures is not None:
                return scale_temperatures[scale]
            # Reference parity: temperature scales z0 only (models.py:143-144);
            # deeper groups sample at T=1 unless temperature_all_groups.
            if g_idx == 0 or cfg.temperature_all_groups:
                return t_scalar
            return None  # T = 1: skip the multiply entirely

        z0_shape = (
            n_samples, shapes.base_size, shapes.base_size, cfg.n_latent_per_group
        )
        # z0 prior: mu = softclamp5(0) = 0, sigma = exp(softclamp5(0)) + 1e-2
        # (reference models.py:141-144).
        mu = jnp.zeros(z0_shape)
        sigma = jnp.full(z0_shape, 1.0 + SIGMA_FLOOR) * group_temp(0, 0)
        z = mu + jax.random.normal(self.make_rng("sample"), z0_shape) * sigma

        x = jnp.tile(self.h[None], (n_samples, 1, 1, 1))
        last_s = x
        x = self.combiners[0](x, z, train)

        rescale_i = 0
        plan = self._plan()
        if plan[0][2]:  # scale 0 has a single group: rescale right after it
            x = self.rescalers[rescale_i](x, train)
            rescale_i += 1
        for scale, g_idx, rescale_after in plan[1:]:
            for cell in self.cells[g_idx]:
                x = cell(x, train)
            raw_dec_mu, raw_dec_ls = self.heads.dec_params(g_idx, x, train)
            mu = softclamp5(raw_dec_mu)
            sigma = _sigma(raw_dec_ls)
            t = group_temp(scale, g_idx)
            if t is not None:
                sigma = sigma * t
            z = mu + jax.random.normal(self.make_rng("sample"), mu.shape) * sigma
            last_s = x
            x = self.combiners[g_idx](x, z, train)
            if rescale_after:
                x = self.rescalers[rescale_i](x, train)
                rescale_i += 1

        z1 = mu + jax.random.normal(self.make_rng("sample"), mu.shape) * sigma
        z2 = mu + jax.random.normal(self.make_rng("sample"), mu.shape) * sigma
        if return_interp_state:
            return x, last_s, z1, z2
        return x

    def generate_from_z(self, z: jax.Array, s: jax.Array, train: bool = False):
        """Re-run only the final group's combiner with a fixed (z, s) — the
        PPL interpolation path (reference ``models.py:181-189``).

        Note: the final decoder group has no rescaler after it, so this feeds
        straight into postprocess, exactly like the reference.
        """
        return self.combiners[-1](s, z, train)


class _Postprocess(nn.Module):
    """n_blocks x n_cells postprocess cells (first cell per block upscales),
    then ELU -> 3x3 conv likelihood head (reference ``postprocess.py:8-34``)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        dt = jnp.dtype(cfg.compute_dtype)
        shapes = cfg.shapes()
        mult = shapes.mult_after_preprocess
        for _ in range(cfg.n_postprocess_blocks):
            mult //= cfg.scale_factor
            channels = cfg.n_decoder_channels * mult
            for cell_idx in range(cfg.n_postprocess_cells):
                x = _maybe_remat(PostprocessCell, cfg)(
                    channels, n_nodes=1, upscale=cell_idx == 0,
                    factor=cfg.scale_factor, se_ratio=cfg.se_ratio,
                    depthwise_5x5=cfg.postprocess_5x5_depthwise,
                    use_pallas=cfg.use_pallas_kernels,
                    mode=cfg.spectral_mode,
                    bn_dtype=jnp.dtype(cfg.bn_apply_dtype), dtype=dt,
                )(x, train)
        x = jax.nn.elu(x)
        if cfg.likelihood == "bernoulli":
            out_ch = cfg.in_channels
        else:  # mixture of discretized logistics
            out_ch = cfg.n_mix * (1 + 2 * cfg.in_channels)
        x = SNConv(out_ch, (3, 3), mode=cfg.spectral_mode, dtype=dt)(x, train)
        return x.astype(jnp.float32)


class NVAE(nn.Module):
    """The full model.  Public methods (invoke via ``.apply(..., method=...)``):

    - ``__call__(x, train, nll)`` -> :class:`ForwardOutput` — posterior pass
      (reference ``NVAE.call``, ``models.py:89-98``).
    - ``sample(n, temperature)`` -> (images, last_s, z1, z2)
      (reference ``NVAE.sample``, ``models.py:137-178``).
    - ``sample_with_z(z, s)`` -> images (reference ``models.py:181-189``).
    """

    cfg: ModelConfig

    def setup(self):
        self.preprocess = _Preprocess(self.cfg)
        self.encoder = _Encoder(self.cfg)
        self.decoder = _Decoder(self.cfg)
        self.postprocess = _Postprocess(self.cfg)

    def __call__(
        self, x: jax.Array, train: bool = False, nll: bool = False
    ) -> ForwardOutput:
        y = self.preprocess(x, train)
        enc_feats, trunk = self.encoder(y, train)
        enc_feats = list(reversed(enc_feats))  # bottom-up -> top-down
        feats, latents, log_p, log_q = self.decoder(
            trunk, enc_feats, train=train, nll=nll
        )
        logits = self.postprocess(feats, train)
        return ForwardOutput(logits=logits, latents=latents, log_p=log_p, log_q=log_q)

    def _to_images(self, logits: jax.Array, greyscale: bool):
        from nvae_tpu.ops import dml_mean, dml_sample

        if self.cfg.likelihood == "bernoulli":
            probs = jax.nn.sigmoid(logits)
            if greyscale:
                return probs
            u = jax.random.uniform(self.make_rng("sample"), probs.shape)
            return (u < probs).astype(jnp.float32)
        if greyscale:
            return dml_mean(logits, self.cfg.n_mix, self.cfg.in_channels)
        return dml_sample(
            logits, self.make_rng("sample"), self.cfg.n_mix, self.cfg.in_channels
        )

    def sample(
        self,
        n_samples: int = 16,
        temperature: float = 1.0,
        greyscale: bool = True,
        scale_temperatures=None,
    ):
        feats, last_s, z1, z2 = self.decoder.generate(
            n_samples, temperature, return_interp_state=True,
            scale_temperatures=scale_temperatures,
        )
        logits = self.postprocess(feats, False)
        images = self._to_images(logits, greyscale)
        return images, last_s, z1, z2

    def sample_with_z(self, z: jax.Array, s: jax.Array):
        feats = self.decoder.generate_from_z(z, s)
        logits = self.postprocess(feats, False)
        return self._to_images(logits, greyscale=True)

    def reconstruct(self, x: jax.Array):
        """Posterior means visualization (reference ``evaluate.py:24-45``)."""
        out = self(x, train=False)
        return self._to_images(out.logits, greyscale=True)
