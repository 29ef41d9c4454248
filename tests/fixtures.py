"""Test fixtures: re-export the synthetic corpus generators, which live in
the package (masg_tpu/data/synthetic.py) so the multichip dryrun can build a
real experiment from the same machinery."""

from masg_tpu.data.synthetic import (  # noqa: F401
    PHONES,
    SR,
    build_synthetic_experiment_dir,
    make_config_dir,
    make_synthetic_corpus,
    synth_utterance,
)
