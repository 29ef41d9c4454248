"""Data pipeline tests over the synthetic corpus: dataset loading, grouped
collate, bucketing, ConcatDataset renormalization, loader iteration."""

import json
import os

import numpy as np
import pytest

from masg_tpu.data.dataset import ConcatDataset, Dataset, pad_1d, round_up_bucket
from masg_tpu.data.loader import GroupedLoader
from masg_tpu.preprocessor.preprocessor import Preprocessor

from fixtures import make_synthetic_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    raw, pre, config = make_synthetic_corpus(str(root), n_speakers=2, utts_per_speaker=6)
    Preprocessor(config).build_from_path()
    return raw, pre, config


def test_dataset_items(corpus):
    raw, pre, config = corpus
    ds = Dataset("train.txt", config, batch_size=2)
    assert len(ds) >= 4
    s = ds[0]
    assert s["text"].ndim == 1 and s["mel"].shape[1] == 80
    assert s["mel"].shape[0] == s["duration"].sum()
    assert len(s["pitch"]) == len(s["text"])
    assert set(s["speaker_meta"]) == {"gender", "language"}
    assert len(s["accent"]) == len(s["text"])


@pytest.mark.smoke
def test_grouped_collate_sorts_and_splits(corpus):
    raw, pre, config = corpus
    ds = Dataset("train.txt", config, batch_size=2, sort=True)
    data = [ds[i] for i in range(len(ds))]
    batches = ds.collate(data)
    # each batch has batch_size (except maybe tail)
    for b in batches[:-1]:
        assert len(b["ids"]) == 2
        # one-hot meta is 4-dim (gender 2 + language 2)
        assert b["speaker_meta"].shape[1] == 4
        # texts padded to batch max
        assert b["texts"].shape[1] == b["src_lens"].max()
        # sorted desc within the mega-batch ordering
    all_lens = [l for b in batches for l in b["src_lens"].tolist()]
    assert sorted(all_lens, reverse=True)[:2] == all_lens[:2]


@pytest.mark.smoke
def test_bucketing(corpus):
    raw, pre, config = corpus
    ds = Dataset("train.txt", config, batch_size=2, text_bucket=16, mel_bucket=64)
    data = [ds[i] for i in range(len(ds))]
    for b in ds.collate(data):
        assert b["texts"].shape[1] % 16 == 0
        assert b["mels"].shape[1] % 64 == 0
        assert b["pitches"].shape == b["texts"].shape
        assert b["durations"].shape == b["texts"].shape


def test_concat_dataset_renormalizes(corpus, tmp_path):
    raw, pre, config = corpus
    ds = Dataset("train.txt", config, batch_size=2)
    # fake "global" stats with different mean/std + global speaker map
    gstats = {"pitch": [-5, 5, 1.0, 2.0], "energy": [-5, 5, 0.5, 3.0]}
    gspeakers = {name: [i + 100] + entry[1:] for i, (name, entry) in enumerate(ds.speaker_map.items())}
    cfg_dir = str(tmp_path)
    json.dump(gstats, open(os.path.join(cfg_dir, "stats.json"), "w"))
    json.dump(gspeakers, open(os.path.join(cfg_dir, "speakers.json"), "w"))

    cat = ConcatDataset(cfg_dir, [ds])
    raw_sample = ds[0]
    cat_sample = cat[0]
    np.testing.assert_allclose(
        cat_sample["pitch"], (raw_sample["pitch"] - 1.0) / 2.0, atol=1e-6
    )
    assert cat_sample["speaker"] == gspeakers[raw_sample["speaker_name"]][0]


def test_loader_iterates(corpus):
    raw, pre, config = corpus
    ds = Dataset("train.txt", config, batch_size=2, sort=True)
    loader = GroupedLoader(ds, batch_size=2, group_size=2, seed=1)
    seen = 0
    for group in loader:
        for batch in group:
            seen += len(batch["ids"])
            assert batch["texts"].dtype == np.int32
    assert seen == len(ds)


def test_reference_tuple_layout(corpus):
    raw, pre, config = corpus
    ds = Dataset("train.txt", config, batch_size=2)
    batches = ds.collate([ds[i] for i in range(2)])
    tup = ds.to_reference_tuple(batches[0])
    assert len(tup) == 14  # accent-corpus wire format (SURVEY §3.1)
    ids, raw_texts, speakers, texts, text_lens, max_tl, mels, mel_lens, max_ml, \
        pitches, energies, durations, speaker_meta, accents = tup
    assert max_tl == texts.shape[1]
    assert mels.shape[2] == 80


def test_frame_level_targets_pad_with_mels(corpus):
    """frame_level pitch/energy arrays must share the mel padding (review
    regression: they padded to the text bucket and broke the frame-level
    VarianceAdaptor branch)."""
    raw, pre, config = corpus
    import copy

    cfg = copy.deepcopy(config)
    cfg["preprocessing"]["pitch"]["feature"] = "frame_level"
    cfg["preprocessing"]["energy"]["feature"] = "frame_level"
    # reuse phoneme-level .npy files: only the padding rule is under test,
    # so fabricate frame-length targets
    ds = Dataset("train.txt", cfg, batch_size=2, text_bucket=16, mel_bucket=64)
    items = [ds[i] for i in range(2)]
    for it in items:
        T = it["mel"].shape[0]
        it["pitch"] = np.zeros(T, np.float32)
        it["energy"] = np.zeros(T, np.float32)
    b = ds.reprocess(items, [0, 1])
    assert b["pitches"].shape[1] == b["mels"].shape[1]
    assert b["energies"].shape[1] == b["mels"].shape[1]
    assert b["durations"].shape == b["texts"].shape


def test_batches_per_epoch_matches_actual_yield(corpus):
    """Resume positioning (Trainer.fit) trusts batches_per_epoch; it must
    equal the ACTUAL number of batches the loader yields under every
    combination of loader-level drop_last (partial mega-batch) and
    dataset-level drop_last (collate's sub-batch_size tail — the training
    default, reference train.py:47)."""
    raw, pre, config = corpus
    for ds_drop in (False, True):
        for ld_drop in (False, True):
            for bs, gs in [(2, 2), (2, 1), (3, 2), (4, 1)]:
                ds = Dataset("train.txt", config, batch_size=bs, sort=True,
                             drop_last=ds_drop)
                if ld_drop and bs * gs >= len(ds):
                    continue  # loader rejects all-dropped configurations
                loader = GroupedLoader(ds, batch_size=bs, group_size=gs,
                                       drop_last=ld_drop, seed=1)
                actual = sum(len(group) for group in loader)
                assert actual == loader.batches_per_epoch, (
                    ds_drop, ld_drop, bs, gs, actual, loader.batches_per_epoch)
