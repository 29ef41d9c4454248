"""FastSpeech2 with mid-attribute speaker generation (flax.linen).

Top model: encoder -> (+ speaker embedding broadcast) -> variance adaptor ->
decoder -> mel linear -> postnet residual; plus the TacoSpawn-style
SpeakerMetaEncoder GMM prior over speaker embeddings conditioned on metadata
one-hots. Reference: model/fastspeech2.py:15-341.

Instead of the reference's positional 10/12/14-tuples the forward returns a
named FS2Output; tuple layouts are reconstructed only at CLI boundaries.
Speaker generation / density evaluation are pure functions over the GMM
parameter pytree (ops/gmm.py) with explicit PRNG keys.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.config import ExperimentConfig
from ..ops.gmm import DiagGMM
from ..ops.masks import pad_mask_from_lengths
from .encoder import Decoder, Encoder
from .jdit import JDIT
from .postnet import PostNet
from .variance_adaptor import VarianceAdaptor, make_bins


class SpeakerMetaEncoder(nn.Module):
    """Metadata one-hot -> diagonal GMM over speaker space (TacoSpawn prior).

    Reference: model/fastspeech2.py:306-341 (three linears: pi via softmax,
    sigma via softplus, mu linear; K mixtures x D = encoder_hidden).
    """

    n_mixtures: int = 3
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, one_hot: jnp.ndarray) -> DiagGMM:
        k, d = self.n_mixtures, self.hidden
        pi = nn.softmax(nn.Dense(k, dtype=self.dtype, name="pi_linear")(one_hot), axis=-1)
        sigma = nn.softplus(
            nn.Dense(k * d, dtype=self.dtype, name="sigma_linear")(one_hot)
        ).reshape(one_hot.shape[:-1] + (k, d))
        mu = nn.Dense(k * d, dtype=self.dtype, name="mu_linear")(one_hot).reshape(
            one_hot.shape[:-1] + (k, d)
        )
        return DiagGMM(pi=pi, mu=mu, sigma=sigma)


class FS2Output(NamedTuple):
    """Named equivalent of the reference's 12-tuple (fastspeech2.py:147-161)."""

    mel: jnp.ndarray  # (B, T, n_mels) pre-postnet
    postnet_mel: jnp.ndarray  # (B, T, n_mels)
    pitch_prediction: jnp.ndarray
    energy_prediction: jnp.ndarray
    log_duration_prediction: jnp.ndarray
    duration_rounded: jnp.ndarray
    src_pad_mask: jnp.ndarray  # (B, L) True at pads
    mel_pad_mask: jnp.ndarray  # (B, T)
    src_len: jnp.ndarray  # (B,)
    mel_len: jnp.ndarray  # (B,)
    speaker_gmm: Optional[DiagGMM] = None  # prior GMM per batch row
    speaker_emb: Optional[jnp.ndarray] = None  # (B, H) table embeddings
    mel_jdit: Optional[jnp.ndarray] = None  # (B, T, n_mels) JDIT teacher mel
    alignments: Optional[jnp.ndarray] = None  # (B, T, L) JDIT soft alignments


class FastSpeech2(nn.Module):
    """See module docstring. Construct via `FastSpeech2.from_config`."""

    n_speakers: int = 1
    multi_speaker: bool = True
    # transformer
    encoder_hidden: int = 256
    encoder_layer: int = 4
    encoder_head: int = 2
    decoder_hidden: int = 256
    decoder_layer: int = 6
    decoder_head: int = 2
    conv_filter_size: int = 1024
    conv_kernel_size: Tuple[int, int] = (9, 1)
    encoder_dropout: float = 0.2
    decoder_dropout: float = 0.2
    max_seq_len: int = 1000
    # variance adaptor
    pitch_bins: Tuple[float, ...] = ()
    energy_bins: Tuple[float, ...] = ()
    n_bins: int = 256
    vp_filter_size: int = 256
    vp_kernel_size: int = 3
    vp_dropout: float = 0.5
    pitch_feature_level: str = "phoneme_level"
    energy_feature_level: str = "phoneme_level"
    # speaker prior
    gmm_mixtures: int = 3
    # joint-duration Tacotron2 teacher (reference jdit.use_jdit); dims
    # default to the reference's hardcoded Tacotron2 hyperparameters
    use_jdit: bool = False
    jdit_attention_rnn_dim: int = 1024
    jdit_decoder_rnn_dim: int = 1024
    jdit_prenet_dim: int = 256
    jdit_attention_dim: int = 128
    jdit_location_filters: int = 32
    jdit_location_kernel: int = 31
    # mel
    n_mel_channels: int = 80
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_config(cfg: ExperimentConfig, dtype=jnp.float32, use_flash: bool = False
                    ) -> "FastSpeech2":
        m, p = cfg.model, cfg.preprocess
        if m.multi_speaker and cfg.speakers is None:
            # the reference fails loudly on a missing speakers.json
            # (fastspeech2.py:39-45); a silent 1-row table would clamp every
            # speaker id to the same embedding
            raise FileNotFoundError(
                f"multi_speaker model but no speakers.json in "
                f"{cfg.config_dir or '<config>'} — run preprocessing/gather "
                f"first or set multi_speaker: False"
            )
        stats = cfg.stats
        if stats is None:
            from ..core.config import Stats

            stats = Stats()
        pitch_bins = tuple(
            make_bins(stats.pitch[0], stats.pitch[1], m.variance_embedding.n_bins,
                      m.variance_embedding.pitch_quantization).tolist()
        )
        energy_bins = tuple(
            make_bins(stats.energy[0], stats.energy[1], m.variance_embedding.n_bins,
                      m.variance_embedding.energy_quantization).tolist()
        )
        return FastSpeech2(
            n_speakers=cfg.n_speakers,
            multi_speaker=m.multi_speaker,
            encoder_hidden=m.transformer.encoder_hidden,
            encoder_layer=m.transformer.encoder_layer,
            encoder_head=m.transformer.encoder_head,
            decoder_hidden=m.transformer.decoder_hidden,
            decoder_layer=m.transformer.decoder_layer,
            decoder_head=m.transformer.decoder_head,
            conv_filter_size=m.transformer.conv_filter_size,
            conv_kernel_size=m.transformer.conv_kernel_size,
            encoder_dropout=m.transformer.encoder_dropout,
            decoder_dropout=m.transformer.decoder_dropout,
            max_seq_len=m.max_seq_len,
            pitch_bins=pitch_bins,
            energy_bins=energy_bins,
            n_bins=m.variance_embedding.n_bins,
            vp_filter_size=m.variance_predictor.filter_size,
            vp_kernel_size=m.variance_predictor.kernel_size,
            vp_dropout=m.variance_predictor.dropout,
            pitch_feature_level=p.pitch.feature,
            energy_feature_level=p.energy.feature,
            gmm_mixtures=m.speaker_generation.GMM_mixtures,
            use_jdit=m.jdit.use_jdit,
            jdit_attention_rnn_dim=m.jdit.attention_rnn_dim,
            jdit_decoder_rnn_dim=m.jdit.decoder_rnn_dim,
            jdit_prenet_dim=m.jdit.prenet_hidden,
            jdit_attention_dim=m.jdit.attention_dim,
            jdit_location_filters=m.jdit.location_filters,
            jdit_location_kernel=m.jdit.location_kernel,
            n_mel_channels=p.mel.n_mel_channels,
            use_flash=use_flash,
            dtype=dtype,
        )

    def setup(self):
        self.encoder = Encoder(
            hidden=self.encoder_hidden,
            n_layers=self.encoder_layer,
            n_head=self.encoder_head,
            d_inner=self.conv_filter_size,
            kernel_size=self.conv_kernel_size,
            dropout=self.encoder_dropout,
            max_seq_len=self.max_seq_len,
            use_flash=self.use_flash,
            dtype=self.dtype,
        )
        self.variance_adaptor = VarianceAdaptor(
            pitch_bins=self.pitch_bins,
            energy_bins=self.energy_bins,
            n_bins=self.n_bins,
            hidden=self.encoder_hidden,
            filter_size=self.vp_filter_size,
            kernel_size=self.vp_kernel_size,
            dropout=self.vp_dropout,
            pitch_feature_level=self.pitch_feature_level,
            energy_feature_level=self.energy_feature_level,
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            hidden=self.decoder_hidden,
            n_layers=self.decoder_layer,
            n_head=self.decoder_head,
            d_inner=self.conv_filter_size,
            kernel_size=self.conv_kernel_size,
            dropout=self.decoder_dropout,
            max_seq_len=self.max_seq_len,
            use_flash=self.use_flash,
            dtype=self.dtype,
        )
        self.mel_linear = nn.Dense(self.n_mel_channels, dtype=self.dtype)
        self.postnet = PostNet(n_mel_channels=self.n_mel_channels, dtype=self.dtype)
        if self.use_jdit:
            self.jdit = JDIT(
                n_mels=self.n_mel_channels, encoder_dim=self.encoder_hidden,
                attention_rnn_dim=self.jdit_attention_rnn_dim,
                decoder_rnn_dim=self.jdit_decoder_rnn_dim,
                prenet_dim=self.jdit_prenet_dim,
                attention_dim=self.jdit_attention_dim,
                location_filters=self.jdit_location_filters,
                location_kernel=self.jdit_location_kernel,
                dtype=self.dtype,
            )
        if self.multi_speaker:
            self.speaker_emb = nn.Embed(self.n_speakers, self.encoder_hidden, dtype=self.dtype)
            self.speaker_enc = SpeakerMetaEncoder(
                n_mixtures=self.gmm_mixtures, hidden=self.encoder_hidden, dtype=self.dtype
            )

    def _synthesis_core(
        self,
        texts: jnp.ndarray,
        src_lens: jnp.ndarray,
        max_mel_len: int,
        speaker_vec: Optional[jnp.ndarray],
        mel_pad_mask_in: Optional[jnp.ndarray],
        mels: Optional[jnp.ndarray],
        p_targets: Optional[jnp.ndarray],
        e_targets: Optional[jnp.ndarray],
        d_targets: Optional[jnp.ndarray],
        p_control: float,
        e_control: float,
        d_control: float,
        accents: Optional[jnp.ndarray],
        deterministic: bool,
    ):
        max_src_len = texts.shape[1]
        src_pad_mask = pad_mask_from_lengths(src_lens, max_src_len)

        x = self.encoder(texts, src_pad_mask, accents, src_lens, deterministic)

        mel_jdit = alignments = None
        if self.use_jdit and mels is not None:
            # teacher consumes raw encoder outputs + ground-truth mels
            # (reference fastspeech2.py:77-78)
            mel_jdit, _gate, alignments = self.jdit(
                x, mels, src_pad_mask, deterministic
            )

        if speaker_vec is not None:
            x = x + speaker_vec[:, None, :]

        va = self.variance_adaptor(
            x,
            src_pad_mask,
            max_mel_len,
            mel_pad_mask_in,
            p_targets,
            e_targets,
            d_targets,
            p_control,
            e_control,
            d_control,
            deterministic,
        )

        dec_out, mel_pad_mask = self.decoder(
            va.x, va.mel_pad_mask, va.mel_len, deterministic, truncate=d_targets is not None
        )
        mel = self.mel_linear(dec_out)
        postnet_mel = self.postnet(mel, deterministic) + mel

        return FS2Output(
            mel=mel,
            postnet_mel=postnet_mel,
            pitch_prediction=va.pitch_prediction,
            energy_prediction=va.energy_prediction,
            log_duration_prediction=va.log_duration_prediction,
            duration_rounded=va.duration_rounded,
            src_pad_mask=src_pad_mask,
            mel_pad_mask=mel_pad_mask,
            src_len=src_lens,
            mel_len=jnp.minimum(va.mel_len, mel_pad_mask.shape[1]),
            mel_jdit=mel_jdit,
            alignments=alignments,
        )

    def __call__(
        self,
        speakers: jnp.ndarray,  # (B,) int ids
        texts: jnp.ndarray,  # (B, L)
        src_lens: jnp.ndarray,  # (B,)
        max_mel_len: int,
        mels: Optional[jnp.ndarray] = None,
        mel_lens: Optional[jnp.ndarray] = None,
        p_targets: Optional[jnp.ndarray] = None,
        e_targets: Optional[jnp.ndarray] = None,
        d_targets: Optional[jnp.ndarray] = None,
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        accents: Optional[jnp.ndarray] = None,
        speaker_meta: Optional[jnp.ndarray] = None,  # (B, meta_dim) one-hot
        deterministic: bool = True,
    ) -> FS2Output:
        speaker_vec = None
        speaker_gmm = None
        if self.multi_speaker:
            speaker_vec = self.speaker_emb(speakers)
            if speaker_meta is not None:
                speaker_gmm = self.speaker_enc(speaker_meta)

        mel_pad_mask_in = (
            pad_mask_from_lengths(mel_lens, max_mel_len) if mel_lens is not None else None
        )
        out = self._synthesis_core(
            texts, src_lens, max_mel_len, speaker_vec, mel_pad_mask_in, mels,
            p_targets, e_targets, d_targets, p_control, e_control, d_control,
            accents, deterministic,
        )
        return out._replace(speaker_gmm=speaker_gmm, speaker_emb=speaker_vec)

    def synthesize_from_speaker_emb(
        self,
        texts: jnp.ndarray,
        src_lens: jnp.ndarray,
        max_mel_len: int,
        speaker_emb: jnp.ndarray,  # (B, H) raw embedding vectors
        p_control: float = 1.0,
        e_control: float = 1.0,
        d_control: float = 1.0,
        accents: Optional[jnp.ndarray] = None,
    ) -> FS2Output:
        """Forward pass bypassing the embedding table
        (reference fastspeech2.py:187-303)."""
        return self._synthesis_core(
            texts, src_lens, max_mel_len, speaker_emb, None, None,
            None, None, None, p_control, e_control, d_control, accents, True,
        )

    def speaker_distribution(self, speaker_meta: jnp.ndarray) -> DiagGMM:
        """Metadata one-hot -> prior GMM (reference fastspeech2.py:182-185)."""
        return self.speaker_enc(speaker_meta)
