"""Batch demo generation: every real speaker + freshly sampled speakers.

Equivalent of the reference's `python examples_gen.py` (examples_gen.py:
114-273): for each table speaker, synthesize a Japanese and an English sample
from its embedding; then for each (language x gender) metadata corner, sample
(n_speakers - 1) // 4 new speakers from the GMM prior and synthesize both
languages; every embedding is saved as .npy beside the wavs.

Sample texts come from --phones_ja/--phones_en (G2P engines are optional in
this image); defaults are short phone strings.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-r", "--restore_step", type=int, required=True,
                    help="checkpoint step to load (0 = random init, for smoke tests only; the reference requires a checkpoint)")
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--text_ja", type=str, default=None)
    parser.add_argument("--text_en", type=str, default=None)
    parser.add_argument("--phones_ja", type=str,
                        default="{k o N n i ch i w a sp m i n a s a N}")
    parser.add_argument("--phones_en", type=str, default="{h h a l o sp w o l d}")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no_vocoder", action="store_true")
    parser.add_argument("--max_real_speakers", type=int, default=None,
                        help="cap table-speaker synthesis (demo runs)")
    parser.add_argument("--duration_control", type=float, default=1.0)
    args = parser.parse_args(argv)

    from ..core.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ..core.config import load_config_dir
    from ..infer.synthesis import load_model, round_up, save_synth_results, synthesize_batch
    from ..infer.vocoder import get_vocoder
    from ..models import FastSpeech2
    from ..ops.gmm import sample as gmm_sample
    from ..text import NO_ACCENT_ID, phone_string_to_sequence, text_to_sequence

    cfg = load_config_dir(args.config)
    if args.restore_step == 0:
        print("WARNING: --restore_step 0 synthesizes with RANDOM weights")
    model, variables = load_model(cfg, args.restore_step)
    vocoder = None if args.no_vocoder else get_vocoder(cfg.model, cfg.config_dir)
    os.makedirs(args.output_path, exist_ok=True)

    def build_text(phones_str, text, lang):
        if text is not None:
            if lang == "ja":
                from ..text.g2p import preprocess_japanese

                phones, _ = preprocess_japanese(text)
            else:
                from ..text.g2p import preprocess_english

                phones = preprocess_english(text)
            ids = text_to_sequence(phones)
        else:
            ids = phone_string_to_sequence(phones_str)
        L = round_up(len(ids), 16)
        texts = np.zeros((1, L), np.int32)
        texts[0, : len(ids)] = ids
        acc = np.zeros((1, L), np.int32)
        acc[0, : len(ids)] = NO_ACCENT_ID
        return texts, np.array([len(ids)], np.int32), acc

    inputs = {
        "ja": build_text(args.phones_ja, args.text_ja, "ja"),
        "en": build_text(args.phones_en, args.text_en, "en"),
    }

    def synth_with_emb(emb, name, lang):
        texts, lens, acc = inputs[lang]
        batch = {"ids": [f"{name}_{lang}"], "raw_texts": [name],
                 "texts": texts, "src_lens": lens, "accents": acc}
        out = synthesize_batch(
            model, variables, batch, max_mel_len=cfg.model.max_seq_len,
            d_control=args.duration_control, speaker_emb=emb,
        )
        save_synth_results(cfg, batch, out, vocoder, args.output_path,
                           write_figures=False)

    # 1) every real table speaker (examples_gen.py:247-256)
    speakers = cfg.speakers or {}
    emb_table = np.asarray(variables["params"]["speaker_emb"]["embedding"])
    names = [n for n in speakers if n != "JSUT"]
    if args.max_real_speakers:
        names = names[: args.max_real_speakers]
    for speaker_name in names:
        sid = speakers[speaker_name][0]
        emb = emb_table[sid : sid + 1]
        synth_with_emb(emb, speaker_name, "ja")
        synth_with_emb(emb, speaker_name, "en")
        np.save(os.path.join(args.output_path, speaker_name + ".npy"), emb)

    # 2) (language x gender) prior samples (examples_gen.py:258-273)
    key = jax.random.PRNGKey(args.seed)
    n_new = max(1, (len(speakers) - 1) // 4) if speakers else 1
    meta_schema = cfg.preprocess.speaker_generation
    for language in ["ja", "en"]:
        for gender in ["M", "F"]:
            meta = meta_schema.one_hot({"gender": gender, "language": language})[None, :]
            for i in range(1, n_new + 1):
                speaker_name = f"{gender}_{language}gen{i:0>3d}"
                gmm = model.apply(variables, np.asarray(meta, np.float32),
                                  method=FastSpeech2.speaker_distribution)
                key, sub = jax.random.split(key)
                emb = np.asarray(gmm_sample(gmm, sub))
                synth_with_emb(emb, speaker_name, "ja")
                synth_with_emb(emb, speaker_name, "en")
                np.save(os.path.join(args.output_path, speaker_name + ".npy"), emb)
    print(f"examples written to {args.output_path}")


if __name__ == "__main__":
    main()
