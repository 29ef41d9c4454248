from .masks import (
    attn_pad_bias,
    masked_fill_time,
    pad_mask_from_lengths,
    valid_mask_from_lengths,
)
from .positional import sinusoid_table
from .length_regulator import expand_scalars, regulate_lengths
from .attention import flash_attention, mha_attention
from .gmm import DiagGMM, component_log_prob, log_prob, mean, sample

__all__ = [
    "attn_pad_bias",
    "masked_fill_time",
    "pad_mask_from_lengths",
    "valid_mask_from_lengths",
    "sinusoid_table",
    "expand_scalars",
    "regulate_lengths",
    "flash_attention",
    "mha_attention",
    "DiagGMM",
    "component_log_prob",
    "log_prob",
    "mean",
    "sample",
]
