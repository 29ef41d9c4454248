"""Typed configuration tree.

Mirrors the reference's three-file YAML schema (preprocess.yaml / model.yaml /
train.yaml per experiment dir, plus per-corpus preprocess_<CORPUS>.yaml and the
derived stats.json / speakers.json artifacts living beside the YAML).
Reference: /root/reference/train.py:326-343, /root/reference/preprocess.py:14-30,
/root/reference/config/JVS-VCTK/*.yaml.

Unlike the reference (raw nested dicts with inconsistent key paths between
consumers), everything here is a typed dataclass; `load_config_dir` accepts the
reference's on-disk layout unchanged so existing experiment dirs keep working.
"""

from __future__ import annotations

import dataclasses
import glob as _glob
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


# ---------------------------------------------------------------------------
# Audio / feature extraction config (reference preprocess.yaml)
# ---------------------------------------------------------------------------


@dataclass
class AudioConfig:
    sampling_rate: int = 22050
    max_wav_value: float = 32768.0


@dataclass
class STFTConfig:
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024


@dataclass
class MelConfig:
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: Optional[float] = 8000.0


@dataclass
class VarianceFeatureConfig:
    # 'phoneme_level' or 'frame_level' (reference preprocess.yaml pitch/energy)
    feature: str = "phoneme_level"
    normalization: bool = True


@dataclass
class SpeakerGenerationMeta:
    # ordered metadata families -> {value_name: one_hot_index}
    # e.g. {"gender": {"M": 0, "F": 1}, "language": {"ja": 0, "en": 1}}
    metadata: Dict[str, Dict[str, int]] = field(
        default_factory=lambda: {"gender": {"M": 0, "F": 1}, "language": {"ja": 0, "en": 1}}
    )

    @property
    def one_hot_dim(self) -> int:
        return sum(len(v) for v in self.metadata.values())

    def one_hot(self, values: Dict[str, str]):
        """Encode {'gender': 'F', 'language': 'ja'} -> concat one-hot vector.

        Same layout as the reference collate (np.eye concat, dataset.py:123-126).
        """
        import numpy as np

        parts = []
        for name, mapping in self.metadata.items():
            vec = np.zeros(len(mapping), dtype=np.float32)
            if name in values:
                vec[int(mapping[values[name]])] = 1.0
            parts.append(vec)
        return np.concatenate(parts, axis=0)


@dataclass
class PreprocessConfig:
    val_size: float = 0.2
    test_size: float = 0.2
    audio: AudioConfig = field(default_factory=AudioConfig)
    stft: STFTConfig = field(default_factory=STFTConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    pitch: VarianceFeatureConfig = field(default_factory=VarianceFeatureConfig)
    energy: VarianceFeatureConfig = field(default_factory=VarianceFeatureConfig)
    speaker_generation: SpeakerGenerationMeta = field(default_factory=SpeakerGenerationMeta)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "PreprocessConfig":
        d = dict(d)
        mel = d.get("mel", {})
        return PreprocessConfig(
            val_size=d.get("val_size", 0.2),
            test_size=d.get("test_size", 0.2),
            audio=AudioConfig(**d.get("audio", {})),
            stft=STFTConfig(**d.get("stft", {})),
            mel=MelConfig(
                n_mel_channels=mel.get("n_mel_channels", 80),
                mel_fmin=mel.get("mel_fmin", 0.0),
                mel_fmax=mel.get("mel_fmax", 8000.0),
            ),
            pitch=VarianceFeatureConfig(**d.get("pitch", {})),
            energy=VarianceFeatureConfig(**d.get("energy", {})),
            speaker_generation=SpeakerGenerationMeta(
                metadata=d.get("speaker_generation", {}).get(
                    "metadata", {"gender": {"M": 0, "F": 1}, "language": {"ja": 0, "en": 1}}
                )
            ),
        )


@dataclass
class CorpusConfig:
    """Per-corpus preprocess_<CORPUS>.yaml (dataset name, paths, text/accent)."""

    dataset: str = ""
    raw_path: str = ""
    preprocessed_path: str = ""
    text_cleaners: List[str] = field(default_factory=list)
    language: str = "ja"
    use_accent: bool = False

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "CorpusConfig":
        path = d.get("path", {})
        text = d.get("text", {})
        accent = d.get("accent", {})
        return CorpusConfig(
            dataset=d.get("dataset", ""),
            raw_path=path.get("raw_path", ""),
            preprocessed_path=path.get("preprocessed_path", ""),
            text_cleaners=text.get("text_cleaners", []) or [],
            language=text.get("language", "ja"),
            use_accent=bool(accent.get("use_accent", False)),
        )


# ---------------------------------------------------------------------------
# Model config (reference model.yaml)
# ---------------------------------------------------------------------------


@dataclass
class TransformerConfig:
    encoder_layer: int = 4
    encoder_head: int = 2
    encoder_hidden: int = 256
    decoder_layer: int = 6
    decoder_head: int = 2
    decoder_hidden: int = 256
    conv_filter_size: int = 1024
    conv_kernel_size: Tuple[int, int] = (9, 1)
    encoder_dropout: float = 0.2
    decoder_dropout: float = 0.2


@dataclass
class VariancePredictorConfig:
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5


@dataclass
class VarianceEmbeddingConfig:
    pitch_quantization: str = "linear"  # 'linear' | 'log'
    energy_quantization: str = "linear"
    n_bins: int = 256


@dataclass
class JDITConfig:
    use_jdit: bool = False
    # dims default to the reference's hardcoded Tacotron2 hyperparameters
    # (reference model/jdit.py Decoder :238-490); configurable so tiny test /
    # dryrun experiments don't pay full-size LSTM-scan compile+execute cost
    prenet_hidden: int = 256
    attention_rnn_dim: int = 1024
    decoder_rnn_dim: int = 1024
    attention_dim: int = 128
    location_filters: int = 32
    location_kernel: int = 31


@dataclass
class VocoderConfig:
    model: str = "HiFi-GAN"  # 'HiFi-GAN' | 'MelGAN'
    speaker: str = "universal"


@dataclass
class SpeakerGenerationModelConfig:
    GMM_mixtures: int = 3


@dataclass
class DiscriminatorConfig:
    hidden: int = 256


@dataclass
class ModelConfig:
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    variance_predictor: VariancePredictorConfig = field(default_factory=VariancePredictorConfig)
    variance_embedding: VarianceEmbeddingConfig = field(default_factory=VarianceEmbeddingConfig)
    jdit: JDITConfig = field(default_factory=JDITConfig)
    multi_speaker: bool = True
    max_seq_len: int = 1000
    vocoder: VocoderConfig = field(default_factory=VocoderConfig)
    speaker_generation: SpeakerGenerationModelConfig = field(
        default_factory=SpeakerGenerationModelConfig
    )
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ModelConfig":
        t = d.get("transformer", {})
        ck = t.get("conv_kernel_size", [9, 1])
        return ModelConfig(
            transformer=TransformerConfig(
                encoder_layer=t.get("encoder_layer", 4),
                encoder_head=t.get("encoder_head", 2),
                encoder_hidden=t.get("encoder_hidden", 256),
                decoder_layer=t.get("decoder_layer", 6),
                decoder_head=t.get("decoder_head", 2),
                decoder_hidden=t.get("decoder_hidden", 256),
                conv_filter_size=t.get("conv_filter_size", 1024),
                conv_kernel_size=(int(ck[0]), int(ck[1])),
                encoder_dropout=t.get("encoder_dropout", 0.2),
                decoder_dropout=t.get("decoder_dropout", 0.2),
            ),
            variance_predictor=VariancePredictorConfig(**d.get("variance_predictor", {})),
            variance_embedding=VarianceEmbeddingConfig(**d.get("variance_embedding", {})),
            jdit=JDITConfig(**d.get("jdit", {})),
            multi_speaker=bool(d.get("multi_speaker", True)),
            max_seq_len=int(d.get("max_seq_len", 1000)),
            vocoder=VocoderConfig(**d.get("vocoder", {})),
            speaker_generation=SpeakerGenerationModelConfig(**d.get("speaker_generation", {})),
            discriminator=DiscriminatorConfig(**d.get("discriminator", {})),
        )


# ---------------------------------------------------------------------------
# Train config (reference train.yaml)
# ---------------------------------------------------------------------------


@dataclass
class PathConfig:
    ckpt_path: str = "./output/ckpt/default"
    log_path: str = "./output/log/default"
    result_path: str = "./output/result/default"
    # langemb configs carry the pretrained GE2E discriminator ckpt here
    # (reference config/JVS-VCTK_langemb_configs/*/train.yaml path:)
    discriminator_path: Optional[str] = None


@dataclass
class OptimizerConfig:
    batch_size: int = 16
    betas: Tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-9
    weight_decay: float = 0.0
    grad_clip_thresh: float = 1.0
    grad_acc_step: int = 1
    warm_up_step: int = 4000
    anneal_steps: Tuple[int, ...] = (300000, 400000, 500000)
    anneal_rate: float = 0.3


@dataclass
class StepConfig:
    total_step: int = 30000
    log_step: int = 100
    synth_step: int = 1000
    val_step: int = 1000
    save_step: int = 10000
    # checkpoint rotation: keep only the newest N step checkpoints (None =
    # keep all, the reference's behavior — train.py:271-285 never deletes)
    keep_last: Optional[int] = None


@dataclass
class TrainConfig:
    path: PathConfig = field(default_factory=PathConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    step: StepConfig = field(default_factory=StepConfig)
    dataparallel: bool = False
    # adversarial language-discriminator loss weight (langemb configs)
    lambda_: float = 1.0
    # path to a pretrained GE2E checkpoint used as the frozen discriminator
    discriminator_path: Optional[str] = None
    # group batching factor: DataLoader batch = batch_size * group_size sorted
    # by text length then split (reference train.py:54-63)
    group_size: int = 4

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "TrainConfig":
        opt = dict(d.get("optimizer", {}))
        betas = opt.pop("betas", (0.9, 0.98))
        anneal = opt.pop("anneal_steps", (300000, 400000, 500000))
        return TrainConfig(
            path=PathConfig(**d.get("path", {})),
            optimizer=OptimizerConfig(
                betas=tuple(betas), anneal_steps=tuple(anneal), **opt
            ),
            step=StepConfig(**d.get("step", {})),
            dataparallel=bool(d.get("dataparallel", False)),
            lambda_=float(d.get("lambda", 1.0)),
            discriminator_path=(
                d.get("discriminator_path")
                or d.get("path", {}).get("discriminator_path")
            ),
            group_size=int(d.get("group_size", 4)),
        )


# ---------------------------------------------------------------------------
# Experiment bundle
# ---------------------------------------------------------------------------


@dataclass
class Stats:
    """stats.json: per-feature [min, max, mean, std] (reference
    preprocessor/preprocessor.py:126-141)."""

    pitch: Tuple[float, float, float, float] = (-3.0, 12.0, 0.0, 1.0)
    energy: Tuple[float, float, float, float] = (-2.0, 10.0, 0.0, 1.0)

    @staticmethod
    def load(path: str) -> "Stats":
        with open(path) as f:
            d = json.load(f)
        return Stats(pitch=tuple(d["pitch"][:4]), energy=tuple(d["energy"][:4]))

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"pitch": list(self.pitch), "energy": list(self.energy)}, f)


@dataclass
class ExperimentConfig:
    preprocess: PreprocessConfig
    model: ModelConfig
    train: TrainConfig
    # corpus name -> CorpusConfig (from preprocess_<CORPUS>.yaml glob)
    corpora: Dict[str, CorpusConfig] = field(default_factory=dict)
    # derived artifacts (stats.json / speakers.json beside the YAML)
    stats: Optional[Stats] = None
    # speaker name -> [id, *metadata_values]
    speakers: Optional[Dict[str, list]] = None
    config_dir: str = ""

    @property
    def n_speakers(self) -> int:
        if self.speakers is None:
            return 1
        return len(self.speakers)


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config_dir(config_dir: str) -> ExperimentConfig:
    """Load a reference-style config directory.

    Layout (reference train.py:326-341): model.yaml, train.yaml,
    preprocess.yaml, optional preprocess_<CORPUS>.yaml glob, optional
    stats.json + speakers.json.
    """
    pre = PreprocessConfig.from_dict(_load_yaml(os.path.join(config_dir, "preprocess.yaml")))
    model = ModelConfig.from_dict(_load_yaml(os.path.join(config_dir, "model.yaml")))
    train = TrainConfig.from_dict(_load_yaml(os.path.join(config_dir, "train.yaml")))

    corpora: Dict[str, CorpusConfig] = {}
    for p in sorted(_glob.glob(os.path.join(config_dir, "preprocess_*.yaml"))):
        try:
            cc = CorpusConfig.from_dict(_load_yaml(p))
        except yaml.YAMLError as e:
            # some shipped reference configs contain placeholder paths with
            # broken quoting (e.g. preprocess_VCTK.yaml `corpus_path: "/path/to/vctk`);
            # skip them with a warning instead of failing the whole experiment
            import warnings

            warnings.warn(f"skipping unparsable corpus config {p}: {e}")
            continue
        name = cc.dataset or os.path.basename(p)[len("preprocess_") : -len(".yaml")]
        corpora[name] = cc

    stats = None
    stats_path = os.path.join(config_dir, "stats.json")
    if os.path.exists(stats_path):
        stats = Stats.load(stats_path)

    speakers = None
    spk_path = os.path.join(config_dir, "speakers.json")
    if os.path.exists(spk_path):
        with open(spk_path) as f:
            speakers = json.load(f)

    return ExperimentConfig(
        preprocess=pre,
        model=model,
        train=train,
        corpora=corpora,
        stats=stats,
        speakers=speakers,
        config_dir=config_dir,
    )


def asdict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)
