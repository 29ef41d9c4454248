from .layers import FFTBlock, MultiHeadAttention, PaddedEmbed, PositionwiseFeedForward
from .encoder import Decoder, Encoder
from .postnet import PostNet
from .variance_adaptor import VarianceAdaptor, VariancePredictor, make_bins
from .fastspeech2 import FS2Output, FastSpeech2, SpeakerMetaEncoder
from .loss import FS2Losses, fastspeech2_loss, speaker_prior_log_prob

__all__ = [
    "FFTBlock",
    "MultiHeadAttention",
    "PaddedEmbed",
    "PositionwiseFeedForward",
    "Decoder",
    "Encoder",
    "PostNet",
    "VarianceAdaptor",
    "VariancePredictor",
    "make_bins",
    "FS2Output",
    "FastSpeech2",
    "SpeakerMetaEncoder",
    "FS2Losses",
    "fastspeech2_loss",
    "speaker_prior_log_prob",
]
