"""End-to-end preprocessing over the synthetic corpus fixture + TextGrid
parser unit tests."""

import json
import os

import numpy as np

from masg_tpu.preprocessor.preprocessor import Preprocessor
from masg_tpu.preprocessor.textgrid import parse_textgrid, read_textgrid

from fixtures import SR, make_synthetic_corpus


def test_textgrid_roundtrip(tmp_path):
    from masg_tpu.preprocessor.textgrid import Interval, TextGrid, Tier, write_textgrid

    tg = TextGrid(tiers=[Tier("phones", [
        Interval(0.0, 0.1, "sil"), Interval(0.1, 0.25, "a"), Interval(0.25, 0.4, "k"),
    ])])
    p = str(tmp_path / "x.TextGrid")
    write_textgrid(p, tg, 0.0, 0.4)
    back = read_textgrid(p)
    tier = back.get_tier_by_name("phones")
    assert [i.text for i in tier.intervals] == ["sil", "a", "k"]
    np.testing.assert_allclose(
        [i.start_time for i in tier.intervals], [0.0, 0.1, 0.25]
    )


def test_textgrid_parses_quoted_specials(tmp_path):
    content = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 1.5
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.5
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 0.75
            text = ""
        intervals [2]:
            xmin = 0.75
            xmax = 1.5
            text = "a"
'''
    tg = parse_textgrid(content)
    tier = tg.get_tier_by_name("phones")
    assert [i.text for i in tier.intervals] == ["", "a"]


def test_preprocess_end_to_end(tmp_path):
    raw, pre, config = make_synthetic_corpus(str(tmp_path), n_speakers=2, utts_per_speaker=4)
    pp = Preprocessor(config)
    out = pp.build_from_path()

    # artifacts exist
    for sub in ("mel", "pitch", "energy", "duration"):
        files = os.listdir(os.path.join(pre, sub))
        assert len(files) == 8, (sub, files)
    stats = json.load(open(os.path.join(pre, "stats.json")))
    assert len(stats["pitch"]) == 4 and len(stats["energy"]) == 4
    # normalized pitch has ~0 mean (synthetic voiced speech)
    assert stats["pitch"][0] < 0 < stats["pitch"][1]

    # consistency: per-utterance mel frames == sum(durations);
    # pitch/energy are phoneme-level (len == n_phones)
    for f in os.listdir(os.path.join(pre, "duration")):
        base = f.replace("-duration-", "|").split("|")
        spk, name = base[0], base[1][:-4]
        dur = np.load(os.path.join(pre, "duration", f))
        mel = np.load(os.path.join(pre, "mel", f"{spk}-mel-{name}.npy"))
        pitch = np.load(os.path.join(pre, "pitch", f"{spk}-pitch-{name}.npy"))
        energy = np.load(os.path.join(pre, "energy", f"{spk}-energy-{name}.npy"))
        assert mel.shape[0] == dur.sum(), (mel.shape, dur.sum())
        assert mel.shape[1] == 80
        assert len(pitch) == len(dur)
        assert len(energy) == len(dur)
        # voiced synthetic speech: most phoneme pitches nonzero after interp
        assert np.mean(pitch != 0) > 0.5

    # splits: 8 utterances -> train 4 (2/spk), val 2, test 2
    train = open(os.path.join(pre, "train.txt")).read().strip().splitlines()
    val = open(os.path.join(pre, "val.txt")).read().strip().splitlines()
    test = open(os.path.join(pre, "test.txt")).read().strip().splitlines()
    assert len(train) + len(val) + len(test) == 8
    assert len(train) >= 4
    # metadata format: basename|speaker|{phones}|raw_text
    parts = train[0].split("|")
    assert len(parts) == 4 and parts[2].startswith("{") and parts[2].endswith("}")
