"""A tf_keras (Keras 2 API) replica of the reference NVAE's *object
structure*, used to generate synthetic TF-format checkpoints whose variable
keys match what the reference's ``model.save_weights`` produces
(reference ``train.py:28,55`` — Keras 2 object-based checkpoints).

Faithful to the reference in everything that determines checkpoint layout
and deterministic forward semantics:

- attribute names / Sequential composition per reference ``preprocess.py``,
  ``encoder.py``, ``decoder.py``, ``postprocess.py``, ``common.py``;
- a ``SpectralNormalization`` wrapper with TFA's exact variable layout
  (``w`` aliasing the wrapped kernel + an ``sn_u`` weight of shape (1, out))
  and TFA's train-time normalize-in-place semantics;
- BatchNorm(momentum .05, eps 1e-5), SE(ratio 16, hidden >= 4), swish/ELU.

Only the deterministic sub-paths need exact call semantics (the importer
round-trip test compares module outputs); the stochastic latent sampling is
not replicated.

This is a TEST FIXTURE: it exists so ``tools/import_reference_ckpt.py`` can
be validated end-to-end without TFA/TFP (neither is installed, and the
reference depends on both).
"""

from __future__ import annotations

import numpy as np
import tensorflow as tf
import tf_keras as keras
from tf_keras import Sequential, layers


def swish(x):
    return keras.activations.swish(x)


class SpectralNormalization(keras.layers.Wrapper):
    """TFA ``SpectralNormalization`` variable layout + semantics
    (tensorflow_addons/layers/spectral_normalization.py): ``self.w`` aliases
    the wrapped layer's kernel, ``self.u`` is add_weight(name="sn_u",
    shape=(1, out)); training calls normalize the kernel IN PLACE."""

    def __init__(self, layer, power_iterations=1, **kw):
        super().__init__(layer, **kw)
        self.power_iterations = power_iterations

    def build(self, input_shape):
        super().build(input_shape)
        if not self.layer.built:
            self.layer.build(input_shape)
        self.w = self.layer.kernel
        self.w_shape = self.w.shape.as_list()
        self.u = self.add_weight(
            shape=(1, self.w_shape[-1]),
            initializer=tf.initializers.TruncatedNormal(stddev=0.02),
            trainable=False,
            name="sn_u",
            dtype=self.w.dtype,
        )

    def call(self, inputs, training=None):
        if training:
            self.normalize_weights()
        return self.layer(inputs)

    def normalize_weights(self):
        w = tf.reshape(self.w, [-1, self.w_shape[-1]])
        u = self.u
        for _ in range(self.power_iterations):
            v = tf.math.l2_normalize(tf.matmul(u, w, transpose_b=True))
            u = tf.math.l2_normalize(tf.matmul(v, w))
        sigma = tf.matmul(tf.matmul(v, w), u, transpose_b=True)
        self.u.assign(tf.cast(u, self.u.dtype))
        self.w.assign(
            tf.cast(tf.reshape(self.w / sigma, self.w_shape), self.w.dtype)
        )


class SqueezeExcitation(keras.Model):
    """Reference ``common.py:110-142``."""

    def __init__(self, ratio=16, **kw):
        super().__init__(**kw)
        self.ratio = ratio

    def build(self, input_shape):
        c = input_shape[-1]
        self.gap = layers.GlobalAveragePooling2D(data_format="channels_last")
        num_hidden = max(c / self.ratio, 4)
        self.dense1 = layers.Dense(units=num_hidden)
        self.dense2 = layers.Dense(units=c)

    def call(self, inputs):
        x = self.gap(inputs)
        x = keras.activations.relu(self.dense1(x))
        x = keras.activations.sigmoid(self.dense2(x))
        return x[:, None, None, :] * inputs


class Rescaler(keras.Model):
    """Reference ``common.py:145-174``; ``up=True`` is RescaleType.UP."""

    def __init__(self, n_channels, scale_factor, up, **kw):
        super().__init__(**kw)
        self.bn = layers.BatchNormalization(momentum=0.05, epsilon=1e-5)
        self.up = up
        self.factor = scale_factor
        strides = (1, 1) if up else (scale_factor, scale_factor)
        self.conv = SpectralNormalization(
            layers.Conv2D(n_channels, (3, 3), strides=strides, padding="same")
        )

    def call(self, inputs, training=None):
        x = self.bn(inputs, training=training)
        x = swish(x)
        if self.up:
            _, h, w, _ = x.get_shape()
            x = tf.image.resize(
                x, size=(self.factor * h, self.factor * w), method="nearest"
            )
        return self.conv(x, training=training)


class SkipScaler(keras.Model):
    """Reference ``preprocess.py:42-74``."""

    def __init__(self, n_channels, **kw):
        super().__init__(**kw)
        quarter = n_channels // 4
        self.conv1 = SpectralNormalization(
            layers.Conv2D(quarter, (1, 1), strides=(2, 2), padding="same")
        )
        self.conv2 = SpectralNormalization(
            layers.Conv2D(quarter, (1, 1), strides=(2, 2), padding="same")
        )
        self.conv3 = SpectralNormalization(
            layers.Conv2D(quarter, (1, 1), strides=(2, 2), padding="same")
        )
        self.conv4 = SpectralNormalization(
            layers.Conv2D(
                n_channels - 3 * quarter, (1, 1), strides=(2, 2),
                padding="same",
            )
        )

    def call(self, x, training=None):
        out = swish(x)
        c1 = self.conv1(out, training=training)
        c2 = self.conv2(out[:, 1:, 1:, :], training=training)
        c3 = self.conv3(out[:, :, 1:, :], training=training)
        c4 = self.conv4(out[:, 1:, :, :], training=training)
        return tf.concat((c1, c2, c3, c4), axis=3)


class BNSwishConv(keras.Model):
    """Reference ``preprocess.py:77-107``."""

    def __init__(self, n_nodes, n_channels, stride, **kw):
        super().__init__(**kw)
        self.nodes = Sequential()
        if stride == (1, 1):
            self.skip = tf.identity
        else:
            self.skip = SkipScaler(n_channels)
        for i in range(n_nodes):
            self.nodes.add(
                layers.BatchNormalization(momentum=0.05, epsilon=1e-5)
            )
            self.nodes.add(layers.Activation(keras.activations.swish))
            self.nodes.add(
                SpectralNormalization(
                    layers.Conv2D(
                        n_channels, (3, 3), stride if i == 0 else (1, 1),
                        padding="same",
                    )
                )
            )
        self.se = SqueezeExcitation()

    def call(self, inputs, training=None):
        if self.skip is tf.identity:
            skipped = inputs
        else:
            skipped = self.skip(inputs, training=training)
        x = self.nodes(inputs, training=training)
        x = self.se(x)
        return skipped + 0.1 * x


class Preprocess(keras.Model):
    """Reference ``preprocess.py:7-39``."""

    def __init__(self, n_encoder_channels, n_blocks, n_cells, scale_factor,
                 **kw):
        super().__init__(**kw)
        self.pre_process = Sequential(
            [SpectralNormalization(
                layers.Conv2D(n_encoder_channels, (3, 3), padding="same")
            )]
        )
        mult = 1
        for _ in range(n_blocks):
            for _ in range(n_cells - 1):
                self.pre_process.add(
                    BNSwishConv(
                        2, mult * n_encoder_channels, stride=(1, 1)
                    )
                )
            self.pre_process.add(
                BNSwishConv(
                    2, mult * n_encoder_channels * scale_factor,
                    stride=(2, 2),
                )
            )
            mult *= scale_factor
        self.mult = mult

    def call(self, inputs, training=None):
        return self.pre_process(2 * inputs - 1, training=training)


class EncoderDecoderCombiner(keras.Model):
    """Reference ``encoder.py:9-16``."""

    def __init__(self, n_channels, **kw):
        super().__init__(**kw)
        self.decoder_conv = SpectralNormalization(
            layers.Conv2D(n_channels, (1, 1))
        )

    def call(self, encoder_x, decoder_x, training=None):
        return encoder_x + self.decoder_conv(decoder_x, training=training)


class EncodingResidualCell(keras.Model):
    """Reference ``encoder.py:86-107`` (incl. the inverted 0.1*identity)."""

    def __init__(self, output_channels, **kw):
        super().__init__(**kw)
        self.batch_norm1 = layers.BatchNormalization(
            momentum=0.05, epsilon=1e-5
        )
        self.conv1 = SpectralNormalization(
            layers.Conv2D(output_channels, (3, 3), padding="same")
        )
        self.batch_norm2 = layers.BatchNormalization(
            momentum=0.05, epsilon=1e-5
        )
        self.conv2 = SpectralNormalization(
            layers.Conv2D(output_channels, (3, 3), padding="same")
        )
        self.se = SqueezeExcitation()

    def call(self, inputs, training=None):
        x = swish(self.batch_norm1(inputs, training=training))
        x = self.conv1(x, training=training)
        x = swish(self.batch_norm2(x, training=training))
        x = self.conv2(x, training=training)
        x = self.se(x)
        return 0.1 * inputs + x


class Encoder(keras.Model):
    """Reference ``encoder.py:19-83``."""

    def __init__(self, n_encoder_channels, res_cells_per_group,
                 n_latent_scales, n_groups_per_scale, mult, scale_factor,
                 **kw):
        super().__init__(**kw)
        self.groups = []
        for scale in range(n_latent_scales):
            n_groups = n_groups_per_scale[scale]
            for group_idx in range(n_groups):
                output_channels = n_encoder_channels * mult
                group = Sequential()
                for _ in range(res_cells_per_group):
                    group.add(EncodingResidualCell(output_channels))
                self.groups.append(group)
                if not (
                    scale == n_latent_scales - 1
                    and group_idx == n_groups - 1
                ):
                    self.groups.append(
                        EncoderDecoderCombiner(output_channels)
                    )
            if scale < n_latent_scales - 1:
                output_channels = n_encoder_channels * mult * scale_factor
                self.groups.append(
                    Rescaler(output_channels, scale_factor, up=False)
                )
                mult *= scale_factor
        self.final_enc = Sequential(
            [
                layers.ELU(),
                SpectralNormalization(
                    layers.Conv2D(
                        n_encoder_channels * mult, (1, 1), padding="same"
                    )
                ),
                layers.ELU(),
            ]
        )
        self.mult = mult

    def call(self, x, training=None):
        feats = []
        for group in self.groups:
            if isinstance(group, EncoderDecoderCombiner):
                feats.append(x)
            else:
                x = group(x, training=training)
        return feats, self.final_enc(x, training=training)

    def combine(self, idx, enc_x, dec_x, training=None):
        """Apply the idx-th (bottom-up) EncoderDecoderCombiner."""
        combiners = [
            g for g in self.groups if isinstance(g, EncoderDecoderCombiner)
        ]
        return combiners[idx](enc_x, dec_x, training=training)


class Sampler(keras.Model):
    """Reference ``common.py:20-102`` (heads only; sampling not needed)."""

    def __init__(self, n_latent_scales, n_groups_per_scale,
                 n_latent_per_group, **kw):
        super().__init__(**kw)
        self.enc_sampler = []
        self.dec_sampler = []
        for scale in range(n_latent_scales):
            for group in range(n_groups_per_scale[scale]):
                self.enc_sampler.append(
                    SpectralNormalization(
                        layers.Conv2D(
                            2 * n_latent_per_group, kernel_size=(3, 3),
                            padding="same",
                        )
                    )
                )
                if scale == 0 and group == 0:
                    self.dec_sampler.append(None)
                else:
                    sampler = Sequential()
                    sampler.add(layers.ELU())
                    sampler.add(
                        SpectralNormalization(
                            layers.Conv2D(
                                2 * n_latent_per_group, kernel_size=(1, 1)
                            )
                        )
                    )
                    self.dec_sampler.append(sampler)

    def call(self, prior, z_idx, training=None):
        return self.enc_sampler[z_idx](prior, training=training)


class DecoderSampleCombiner(keras.Model):
    """Reference ``decoder.py:107-117``."""

    def __init__(self, output_channels, **kw):
        super().__init__(**kw)
        self.conv = SpectralNormalization(
            layers.Conv2D(
                output_channels, (1, 1), strides=(1, 1), padding="same"
            )
        )

    def call(self, x, z, training=None):
        return self.conv(tf.concat((x, z), axis=3), training=training)


class GenerativeResidualCell(keras.Model):
    """Reference ``decoder.py:120-147``."""

    def __init__(self, output_channels, expansion_ratio=6, **kw):
        super().__init__(**kw)
        self.batch_norm1 = layers.BatchNormalization(
            momentum=0.05, epsilon=1e-5
        )
        self.conv1 = SpectralNormalization(
            layers.Conv2D(
                expansion_ratio * output_channels, (1, 1), padding="same"
            )
        )
        self.batch_norm2 = layers.BatchNormalization(
            momentum=0.05, epsilon=1e-5
        )
        self.depth_conv = layers.DepthwiseConv2D((5, 5), padding="same")
        self.batch_norm3 = layers.BatchNormalization(
            momentum=0.05, epsilon=1e-5
        )
        self.conv2 = SpectralNormalization(
            layers.Conv2D(output_channels, (1, 1), padding="same")
        )
        self.batch_norm4 = layers.BatchNormalization(
            momentum=0.05, epsilon=1e-5
        )
        self.se = SqueezeExcitation()

    def call(self, inputs, training=None):
        x = self.batch_norm1(inputs, training=training)
        x = self.conv1(x, training=training)
        x = swish(self.batch_norm2(x, training=training))
        x = self.depth_conv(x)
        x = swish(self.batch_norm3(x, training=training))
        x = self.conv2(x, training=training)
        x = self.batch_norm4(x, training=training)
        x = self.se(x)
        return 0.1 * inputs + x


class Decoder(keras.Model):
    """Reference ``decoder.py:9-104`` — structure + deterministic pieces."""

    def __init__(self, n_decoder_channels, res_cells_per_group,
                 n_latent_scales, n_groups_per_scale, n_latent_per_group,
                 mult, scale_factor, base_size, **kw):
        super().__init__(**kw)
        self.sampler = Sampler(
            n_latent_scales=n_latent_scales,
            n_groups_per_scale=n_groups_per_scale,
            n_latent_per_group=n_latent_per_group,
        )
        self.groups = []
        for scale in range(n_latent_scales):
            n_groups = n_groups_per_scale[scale]
            for group in range(n_groups):
                output_channels = int(n_decoder_channels * mult)
                if not (scale == 0 and group == 0):
                    seq = Sequential()
                    for _ in range(res_cells_per_group):
                        seq.add(GenerativeResidualCell(output_channels))
                    self.groups.append(seq)
                self.groups.append(DecoderSampleCombiner(output_channels))
            if scale < n_latent_scales - 1:
                output_channels = int(n_decoder_channels * mult / scale_factor)
                self.groups.append(
                    Rescaler(output_channels, scale_factor, up=True)
                )
                mult /= scale_factor
        self.mult = mult
        self.h = tf.Variable(
            tf.random.uniform(
                (base_size, base_size, n_decoder_channels), minval=0,
                maxval=1,
            ),
            trainable=True,
        )


class Postprocess(keras.Model):
    """Reference ``postprocess.py:8-111`` (cells, nodes, ConvBNSwish)."""

    def __init__(self, n_blocks, n_cells, mult, n_channels_decoder,
                 scale_factor, **kw):
        super().__init__(**kw)
        self.sequence = Sequential()
        for _ in range(n_blocks):
            mult /= scale_factor
            output_channels = int(n_channels_decoder * mult)
            for cell_idx in range(n_cells):
                self.sequence.add(
                    PostprocessCell(
                        output_channels, n_nodes=1,
                        upscale=cell_idx == 0, scale_factor=scale_factor,
                    )
                )
        self.sequence.add(layers.Activation(keras.activations.elu))
        self.sequence.add(
            SpectralNormalization(
                layers.Conv2D(1, kernel_size=(3, 3), padding="same")
            )
        )
        self.mult = mult

    def call(self, inputs, training=None):
        return self.sequence(inputs, training=training)


class PostprocessCell(keras.Model):
    def __init__(self, n_channels, n_nodes, scale_factor, upscale, **kw):
        super().__init__(**kw)
        self.sequence = Sequential()
        if upscale:
            self.skip = Rescaler(n_channels, scale_factor, up=True)
        else:
            self.skip = tf.identity
        for _ in range(n_nodes):
            self.sequence.add(
                PostprocessNode(
                    n_channels, upscale=upscale, scale_factor=scale_factor
                )
            )
            upscale = False

    def call(self, inputs, training=None):
        if self.skip is tf.identity:
            skipped = inputs
        else:
            skipped = self.skip(inputs, training=training)
        return skipped + 0.1 * self.sequence(inputs, training=training)


class PostprocessNode(keras.Model):
    def __init__(self, n_channels, scale_factor, upscale,
                 expansion_ratio=6, **kw):
        super().__init__(**kw)
        self.sequence = Sequential()
        if upscale:
            self.sequence.add(Rescaler(n_channels, scale_factor, up=True))
        self.sequence.add(
            layers.BatchNormalization(momentum=0.05, epsilon=1e-5)
        )
        hidden_dim = n_channels * expansion_ratio
        self.sequence.add(ConvBNSwish(hidden_dim, kernel_size=(1, 1)))
        self.sequence.add(ConvBNSwish(hidden_dim, kernel_size=(5, 5)))
        self.sequence.add(
            SpectralNormalization(
                layers.Conv2D(
                    n_channels, kernel_size=(1, 1), strides=(1, 1),
                    use_bias=False,
                )
            )
        )
        self.sequence.add(
            layers.BatchNormalization(momentum=0.05, epsilon=1e-5)
        )
        self.sequence.add(SqueezeExcitation())

    def call(self, inputs, training=None):
        return self.sequence(inputs, training=training)


class ConvBNSwish(keras.Model):
    def __init__(self, n_channels, kernel_size, **kw):
        super().__init__(**kw)
        self.sequence = Sequential()
        self.sequence.add(
            SpectralNormalization(
                layers.Conv2D(
                    n_channels, kernel_size=kernel_size, strides=(1, 1),
                    use_bias=False, padding="same",
                )
            )
        )
        self.sequence.add(
            layers.BatchNormalization(momentum=0.05, epsilon=1e-5)
        )
        self.sequence.add(layers.Activation(keras.activations.swish))

    def call(self, inputs, training=None):
        return self.sequence(inputs, training=training)


class ReferenceNVAE(keras.Model):
    """Reference ``models.py:16-98`` object structure, built from an
    ``nvae_tpu.config.ModelConfig``."""

    def __init__(self, cfg, **kw):
        super().__init__(**kw)
        self.preprocess = Preprocess(
            cfg.n_encoder_channels, cfg.n_preprocess_blocks,
            cfg.n_preprocess_cells, cfg.scale_factor,
        )
        mult = self.preprocess.mult
        self.encoder = Encoder(
            n_encoder_channels=cfg.n_encoder_channels,
            res_cells_per_group=cfg.res_cells_per_group,
            n_latent_scales=cfg.n_latent_scales,
            n_groups_per_scale=list(cfg.n_groups_per_scale),
            mult=mult,
            scale_factor=cfg.scale_factor,
        )
        mult = self.encoder.mult
        shapes = cfg.shapes()
        self.decoder = Decoder(
            n_decoder_channels=cfg.n_decoder_channels,
            res_cells_per_group=cfg.res_cells_per_group,
            n_latent_scales=cfg.n_latent_scales,
            n_groups_per_scale=list(reversed(cfg.n_groups_per_scale)),
            n_latent_per_group=cfg.n_latent_per_group,
            mult=mult,
            scale_factor=cfg.scale_factor,
            base_size=shapes.base_size,
        )
        mult = self.decoder.mult
        self.postprocess = Postprocess(
            cfg.n_postprocess_blocks, cfg.n_postprocess_cells,
            mult=mult, n_channels_decoder=cfg.n_decoder_channels,
            scale_factor=cfg.scale_factor,
        )
        self.cfg = cfg

    def build_all(self, batch=2, training=True):
        """Run every submodule once so all weights exist (and, with
        ``training=True``, every SN kernel is normalized in place and the
        BN moving statistics move off their init)."""
        cfg = self.cfg
        shapes = cfg.shapes()
        x = np.random.RandomState(0).rand(
            batch, cfg.image_size, cfg.image_size, cfg.in_channels
        ).astype("float32")
        x = self.preprocess(x, training=training)
        feats, trunk = self.encoder(x, training=training)

        # Decoder walk mirroring reference decoder.call: group 0 combiner on
        # (h, z0), then per-group cells + combiner, rescalers between scales.
        rng = np.random.RandomState(1)
        groups_topdown = list(reversed(cfg.n_groups_per_scale))
        n_total = sum(groups_topdown)
        # Latent heads: enc head g on the (top-down) encoder feature or
        # decoder state; dec head g on the decoder state.
        z0 = rng.randn(
            batch, shapes.base_size, shapes.base_size, cfg.n_latent_per_group
        ).astype("float32")
        h = tf.tile(self.decoder.h[None], [batch, 1, 1, 1])
        _ = self.decoder.sampler(trunk, 0, training=training)
        dec_x = None
        gi = 0  # decoder.groups index
        g_idx = 0  # flat group index
        feats_topdown = list(reversed(feats))
        for scale in range(cfg.n_latent_scales):
            for group in range(groups_topdown[scale]):
                if not (scale == 0 and group == 0):
                    dec_x = self.decoder.groups[gi](dec_x, training=training)
                    gi += 1
                    # enc-dec combine + heads for this group
                    enc_prior = self.encoder.combine(
                        n_total - 1 - g_idx, feats_topdown[g_idx - 1],
                        dec_x, training=training,
                    )
                    _ = self.decoder.sampler(
                        enc_prior, g_idx, training=training
                    )
                    dseq = self.decoder.sampler.dec_sampler[g_idx]
                    _ = dseq(dec_x, training=training)
                    z = rng.randn(*z0.shape[:1], *dec_x.shape[1:3],
                                  cfg.n_latent_per_group).astype("float32")
                    dec_x = self.decoder.groups[gi](
                        dec_x, z, training=training
                    )
                else:
                    dec_x = self.decoder.groups[gi](h, z0, training=training)
                gi += 1
                g_idx += 1
            if scale < cfg.n_latent_scales - 1:
                dec_x = self.decoder.groups[gi](dec_x, training=training)
                gi += 1
        out = self.postprocess(dec_x, training=training)
        return out
