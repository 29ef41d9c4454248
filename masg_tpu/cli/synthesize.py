"""Single-sentence synthesis CLI.

Equivalent of the reference's `python synthesize.py --text ... -s <speaker_id>
-l {ja,en,zh} [--use_accent] -r <restore_step> -c <config_dir>
[--pitch/energy/duration_control]` (synthesize.py:104-243). Extra over the
reference: `--phones`/`--accents` accept a phone string directly so synthesis
works without the native G2P engines.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-r", "--restore_step", type=int, required=True,
                    help="checkpoint step to load (0 = random init, for smoke tests only; the reference requires a checkpoint)")
    parser.add_argument("-t", "--text", type=str, default=None)
    parser.add_argument("--phones", type=str, default=None,
                        help="direct phone string '{k o N ...}' (skips G2P)")
    parser.add_argument("--accents", type=str, default=None,
                        help="accent string e.g. '0[#]0...' matching --phones")
    parser.add_argument("-s", "--speaker_id", type=int, default=0)
    parser.add_argument("-l", "--language", type=str, default="ja",
                        choices=["ja", "en", "zh"])
    parser.add_argument("--use_accent", action="store_true")
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--pitch_control", type=float, default=1.0)
    parser.add_argument("--energy_control", type=float, default=1.0)
    parser.add_argument("--duration_control", type=float, default=1.0)
    parser.add_argument("--no_vocoder", action="store_true")
    parser.add_argument("--max_frames", type=int, default=None,
                        help="mel frame cap (default model.max_seq_len); "
                             "smaller caps compile much faster on TPU")
    parser.add_argument("--chunk_phones", type=int, default=None,
                        help="unbounded-length mode: split the text at pause "
                             "phones into <=N-phone chunks, synthesize them "
                             "in one batched dispatch, stitch the audio "
                             "(the reference truncates past max_seq_len)")
    parser.add_argument("--result_path", type=str, default=None)
    parser.add_argument("--lexicon", type=str, default=None,
                        help="pinyin lexicon path (zh); defaults to "
                             "<config_dir>/lexicon/pinyin-lexicon-r.txt or cwd")
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..core.config import load_config_dir
    from ..infer.synthesis import load_model, round_up, save_synth_results, synthesize_batch
    from ..infer.vocoder import get_vocoder
    from ..text import NO_ACCENT_ID, ACCENT_TO_ID, phone_string_to_sequence, text_to_sequence

    cfg = load_config_dir(args.config)
    if args.restore_step == 0:
        print("WARNING: --restore_step 0 synthesizes with RANDOM weights")
    model, variables = load_model(cfg, args.restore_step)

    accents_ids = None
    if args.phones:
        ids = phone_string_to_sequence(args.phones)
        raw_text = args.phones
        if args.accents:
            accents_ids = [ACCENT_TO_ID[c] for c in args.accents][: len(ids)]
    else:
        assert args.text is not None, "need --text or --phones"
        raw_text = args.text
        if args.language == "ja":
            from ..text.g2p import preprocess_japanese

            phones, accents = preprocess_japanese(args.text)
            ids = text_to_sequence(phones)
            if args.use_accent:
                accents_ids = [ACCENT_TO_ID[c] for c in accents][: len(ids)]
        elif args.language == "en":
            from ..text.g2p import preprocess_english

            phones = preprocess_english(args.text)
            print("Raw Text Sequence: {}".format(args.text))
            print("Phoneme Sequence: {}".format(phones))
            ids = text_to_sequence(phones)
        else:
            from ..text import pinyin_to_sequence
            from ..text.g2p import preprocess_mandarin, resolve_lexicon_path

            phones = preprocess_mandarin(
                args.text, resolve_lexicon_path(args.lexicon, cfg.config_dir))
            ids = pinyin_to_sequence(phones)

    vocoder = None if args.no_vocoder else get_vocoder(cfg.model, cfg.config_dir)
    result_path = args.result_path or cfg.train.path.result_path
    meta_dim = cfg.preprocess.speaker_generation.one_hot_dim
    base = (raw_text[:20].replace(" ", "_").replace("{", "").replace("}", "")
            or "utt")

    if args.chunk_phones:
        from ..audio.wavio import write_wav
        from ..infer.synthesis import synthesize_long

        r = synthesize_long(
            model, variables, ids, accents_ids,
            speaker_id=args.speaker_id,
            p_control=args.pitch_control, e_control=args.energy_control,
            d_control=args.duration_control,
            max_phones=args.chunk_phones,
            max_mel_len=args.max_frames or cfg.model.max_seq_len,
            vocoder=vocoder, meta_dim=meta_dim,
        )
        os.makedirs(result_path, exist_ok=True)
        sr = cfg.preprocess.audio.sampling_rate
        print(f"mel_len={r['mel_len']} over {r['n_chunks']} chunks "
              f"({r['mel_len'] * cfg.preprocess.stft.hop_length / sr:.1f}s)")
        if "wav" in r:
            path = os.path.join(result_path, base + ".wav")
            write_wav(path, r["wav"], sr)
            print("wrote", path)
        else:
            path = os.path.join(result_path, base + ".npy")
            np.save(path, r["mel"])
            print("wrote", path)
        return

    L = round_up(len(ids), 16)
    texts = np.zeros((1, L), np.int32)
    texts[0, : len(ids)] = ids
    acc = np.zeros((1, L), np.int32)
    if accents_ids is not None:
        acc[0, : len(accents_ids)] = accents_ids
    else:
        acc[0, : len(ids)] = NO_ACCENT_ID
    batch = {
        "ids": [base],
        "raw_texts": [raw_text],
        "speakers": np.array([args.speaker_id], np.int32),
        "texts": texts,
        "src_lens": np.array([len(ids)], np.int32),
        "accents": acc,
        # zero speaker_meta vector at synthesis (reference synthesize.py:222)
        "speaker_meta": np.zeros((1, meta_dim), np.float32),
    }

    output = synthesize_batch(
        model, variables, batch,
        p_control=args.pitch_control, e_control=args.energy_control,
        d_control=args.duration_control,
        max_mel_len=args.max_frames or cfg.model.max_seq_len,
    )
    written = save_synth_results(cfg, batch, output, vocoder, result_path)
    print(f"mel_len={int(np.asarray(output.mel_len)[0])} -> {result_path}")
    for w in written:
        print("wrote", w)


if __name__ == "__main__":
    main()
