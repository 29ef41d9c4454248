"""End-to-end preprocessing over the synthetic corpus fixture + TextGrid
parser unit tests."""

import json
import os

import pytest
import numpy as np

from masg_tpu.preprocessor.preprocessor import Preprocessor
from masg_tpu.preprocessor.textgrid import parse_textgrid, read_textgrid

from fixtures import SR, make_synthetic_corpus


@pytest.mark.smoke
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


@pytest.mark.smoke
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


def test_alignment_prep(tmp_path):
    """Full-context .lab -> TextGrid + accent files (prepare_alignments)."""
    from masg_tpu.cli.prepare_alignments import main as prep_main
    from masg_tpu.preprocessor.textgrid import read_textgrid

    lab_dir = tmp_path / "labs"
    lab_dir.mkdir()
    # minimal HTS full-context label: times in 100ns, phone in -p+ context,
    # A:/F: accent fields consumed by pp_symbols
    lines = [
        "0 2000000 xx^xx-sil+k=o/A:-50+-50+-50/F:xx_xx",
        "2000000 3500000 xx^sil-k+o=N/A:0+1+2/F:2_1",
        "3500000 5500000 sil^k-o+N=pau/A:0+2+1/F:2_1",
        "5500000 6000000 k^o-pau+n=i/A:-50+-50+-50/F:xx_xx",
        "6000000 7500000 o^pau-n+i=sil/A:0+1+1/F:1_1",
        "7500000 9000000 pau^n-i+sil=xx/A:0+1+1/F:1_1",
        "9000000 10000000 n^i-sil+xx=xx/A:-50+-50+-50/F:xx_xx",
    ]
    (lab_dir / "utt1.lab").write_text("\n".join(lines) + "\n")

    out = tmp_path / "out"
    prep_main([str(lab_dir), str(out), "spkA", "--with_accent"])

    tg = read_textgrid(str(out / "TextGrid" / "spkA" / "utt1.TextGrid"))
    texts = [i.text for i in tg.get_tier_by_name("phones").intervals]
    # 'sil' stays as-is (only Julius silB/silE are blanked, matching the
    # reference convert_label.py:43-48); pau -> sp; the feature extractor's
    # sil_phones list handles both spellings
    assert texts == ["sil", "k", "o", "sp", "n", "i", "sil"]
    accent = (out / "accent" / "utt1.accent").read_text()
    assert len(accent) == 5  # k o sp n i
    assert set(accent) <= {"0", "[", "]", "#"}


def test_ge2e_preprocess_chunks(tmp_path):
    """VAD split + chunking produces 150-frame mel archives."""
    import numpy as np

    from masg_tpu.audio.wavio import write_wav
    from masg_tpu.preprocessor.ge2e_preprocess import build_ge2e_corpus

    sr = 22050
    # chunks need 150 frames * 256 hop ~ 1.74 s of voiced audio per span
    t = np.arange(int(6.0 * sr)) / sr
    wav = (0.5 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    # insert a silent gap splitting two >2 s voiced spans
    wav[int(2.5 * sr) : int(3.0 * sr)] = 0.0
    p = tmp_path / "a.wav"
    write_wav(str(p), wav, sr)

    written = build_ge2e_corpus(
        {"spk1": ([str(p)], "F", "ja")}, str(tmp_path / "chunks"), "SYNTH", sr
    )
    assert written == ["synth_spk1_F_ja.npy"]
    arr = np.load(tmp_path / "chunks" / written[0])
    assert arr.ndim == 3 and arr.shape[1] == 80 and arr.shape[2] == 150
    assert arr.shape[0] >= 2


def test_ge2e_stride_chunks_feed_training(tmp_path):
    """stride=N chunk prep (small-corpus mode, used by the full-pipeline
    demo) yields archives the GE2E trainer consumes directly: sliding
    windows > end-windows count, and SpeakerChunkDataset can fill an NxM
    batch from them without replacement."""
    import numpy as np

    from masg_tpu.audio.wavio import write_wav
    from masg_tpu.preprocessor.ge2e_preprocess import build_ge2e_corpus
    from masg_tpu.train.ge2e import SpeakerChunkDataset

    sr = 22050
    rng = np.random.default_rng(0)
    spk_map = {}
    for i, (g, lang, f0) in enumerate(
            (("M", "ja", 130.0), ("F", "ja", 220.0), ("M", "en", 140.0))):
        t = np.arange(int(5.0 * sr)) / sr
        w = (0.4 * np.sin(2 * np.pi * f0 * t)
             * (1 + 0.2 * np.sin(2 * np.pi * (3 + i) * t))
             + 0.01 * rng.normal(size=t.shape)).astype(np.float32)
        p = tmp_path / f"s{i}.wav"
        write_wav(str(p), w, sr)
        spk_map[f"s{i}"] = ([str(p)], g, lang)

    out = str(tmp_path / "chunks")
    written = build_ge2e_corpus(spk_map, out, "SYNTH", sr, stride=75)
    assert len(written) == 3
    for f in written:
        arr = np.load(tmp_path / "chunks" / f)
        assert arr.shape[0] >= 4 and arr.shape[1:] == (80, 150)

    ds = SpeakerChunkDataset(out, ["SYNTH"], m_utts=4, seed=0)
    mels, langs = ds.sample_batch(3, variable_length=False)
    assert mels.shape == (12, 150, 80) and np.isfinite(mels).all()
    assert set(langs.tolist()) == {0.0, 1.0}  # lang-balanced batch
