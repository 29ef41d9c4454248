"""GE2E speaker-encoder quality report (VERDICT r5 item 4): train the
encoder on a held-out split of the reference-scale bilingual corpus and
report speaker-verification EER + DA language-classification accuracy on
UNSEEN speakers.

Reference anchor: /root/reference/Multilingual-Speaker-Encoder-with-Domain-
Adaptation/train_speech_embedder.py:115-248 (trainer) + :387-460 (its
test/EER path, which the reference never reports numbers from either).

    python scripts/ge2e_quality.py --corpus /tmp/refscale --out /tmp/refscale
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True,
                    help="reference_scale_run --out dir (raw_data/SYNJVS + "
                         "SYNVCTK + per-corpus speakers.json)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--train_speakers_per_corpus", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--n", type=int, default=16, help="speakers per batch")
    ap.add_argument("--m", type=int, default=6, help="utterances per speaker")
    ap.add_argument("--batches_per_epoch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunks_only", action="store_true",
                    help="stop after chunk prep (CPU stage) so the chip "
                         "stage can be scheduled separately")
    args = ap.parse_args()

    import glob

    import numpy as np

    import jax
    import jax.numpy as jnp

    from masg_tpu.models.speaker_encoder import SpeechEmbedder
    from masg_tpu.preprocessor.ge2e_preprocess import build_ge2e_corpus
    from masg_tpu.train.ge2e import (SpeakerChunkDataset, evaluate_eer,
                                     train_speaker_encoder)

    t0 = time.time()

    def mark(msg):
        print(f"[ge2e +{time.time()-t0:6.1f}s] {msg}", flush=True)

    ev = {}
    train_dir = os.path.join(args.out, "ge2e_chunks_train")
    held_dir = os.path.join(args.out, "ge2e_chunks_heldout")
    datasets = ["SYNJVS", "SYNVCTK"]
    if not os.path.exists(os.path.join(held_dir, "done.json")):
        t1 = time.time()
        n_train_chunks = n_held_chunks = 0
        for dataset in datasets:
            with open(os.path.join(args.corpus, "preprocessed_data", dataset,
                                   "speakers.json")) as f:
                speakers = json.load(f)
            raw = os.path.join(args.corpus, "raw_data", dataset)
            names = sorted(speakers)
            split = args.train_speakers_per_corpus
            for sub, dirname in ((names[:split], train_dir),
                                 (names[split:], held_dir)):
                spk_map = {
                    spk: (sorted(glob.glob(os.path.join(raw, spk, "*.wav"))),
                          speakers[spk][1], speakers[spk][2])
                    for spk in sub}
                written = build_ge2e_corpus(spk_map, dirname, dataset=dataset,
                                            stride=75)
                n = sum(int(np.load(os.path.join(dirname, f)).shape[0])
                        for f in written)
                if dirname == train_dir:
                    n_train_chunks += n
                else:
                    n_held_chunks += n
        with open(os.path.join(held_dir, "done.json"), "w") as f:
            json.dump({"train_chunks": n_train_chunks,
                       "held_chunks": n_held_chunks}, f)
        mark(f"chunk prep: {n_train_chunks} train / {n_held_chunks} held-out "
             f"chunks in {time.time()-t1:.0f}s")
    with open(os.path.join(held_dir, "done.json")) as f:
        ev["chunks"] = json.load(f)
    if args.chunks_only:
        print(json.dumps(ev, indent=1), flush=True)
        return

    # --- train on the train-speaker split (chip) ----------------------
    enc_dir = os.path.join(args.out, "spk_enc")
    t1 = time.time()
    state = train_speaker_encoder(
        train_dir, datasets, enc_dir, n_speakers=args.n, m_utts=args.m,
        epochs=args.epochs, batches_per_epoch=args.batches_per_epoch,
        da_startpoint=0.5, checkpoint_interval=args.epochs, seed=args.seed)
    ev["train_wall_s"] = round(time.time() - t1, 1)
    ev["train_speakers"] = 2 * args.train_speakers_per_corpus
    mark(f"encoder trained {args.epochs} epochs in {ev['train_wall_s']}s")

    # --- held-out EER + DA language accuracy --------------------------
    held = SpeakerChunkDataset(held_dir, datasets, m_utts=10,
                               seed=args.seed + 1)
    embedder = SpeechEmbedder(n_mels=80)
    params = jax.device_get(state.embedder_params)
    eer, thresh = evaluate_eer(embedder, params, held,
                               n_speakers=min(10, len(held)), m_utts=10,
                               epochs=10)
    ev["heldout_speakers"] = len(held)
    ev["eer"] = round(float(eer), 4)
    ev["eer_threshold"] = round(float(thresh), 3)
    mark(f"held-out EER {eer:.3f} @ threshold {thresh:.2f} "
         f"({len(held)} unseen speakers)")

    # DA language accuracy on held-out chunks (langs: sorted -> en=0, ja=1)
    apply = jax.jit(lambda p, x: embedder.apply(
        {"params": p}, x, deterministic=True)["da_lang_logits"])
    correct = total = 0
    for _ in range(10):
        mels, langs = held.sample_batch(min(10, len(held)),
                                        variable_length=False)
        logits = np.asarray(apply(params, jnp.asarray(mels)))
        pred = (logits > 0.0).astype(np.float32)
        correct += int((pred == langs).sum())
        total += len(langs)
    ev["da_language_accuracy"] = round(correct / total, 4)
    mark(f"held-out DA language accuracy {ev['da_language_accuracy']:.3f}")

    ev["wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(args.out, "ge2e_quality.json"), "w") as f:
        json.dump(ev, f, indent=1)
    print(json.dumps(ev, indent=1), flush=True)


if __name__ == "__main__":
    main()
