"""GE2E speaker encoder tests: similarity golden vs torch reference math,
chunk dataset sampling, a few training steps improve speaker separation."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masg_tpu.models.speaker_encoder import (
    SpeechEmbedder,
    bce_with_logits_sum,
    chunk_mels,
    ge2e_loss,
    ge2e_similarity,
    ge2e_softmax_loss,
    init_ge2e_params,
)


@pytest.mark.smoke
def test_similarity_matches_torch_reference():
    torch = pytest.importorskip("torch")
    # the reference's similarity helpers (utils.py) need hparam/librosa, so
    # its math is reimplemented in torch here from the same formulas —
    # deliberately NOT inserting the submodule dir on sys.path (its utils.py
    # would shadow /root/reference/utils for later tests)
    N, M, D = 4, 3, 8
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(N, M, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    te = torch.from_numpy(emb)
    centr_inc = te.mean(dim=1)  # (N, D)
    centr_exc = (te.sum(dim=1, keepdim=True) - te) / (M - 1)
    sim = torch.nn.functional.cosine_similarity(
        te.unsqueeze(2), centr_inc.unsqueeze(0).unsqueeze(0).expand(N, M, -1, -1), dim=3
    )
    sim_self = torch.nn.functional.cosine_similarity(te, centr_exc, dim=2)
    idx = list(range(N))
    sim[idx, :, idx] = sim_self[idx, :]
    ref = sim.numpy()

    ours = np.asarray(ge2e_similarity(jnp.asarray(emb)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # softmax loss formula (utils.py:126-135)
    ref_loss = float(
        torch.sum(torch.log(torch.sum(torch.exp(sim), dim=2) + 1e-6))
        - torch.sum(sim[idx, :, idx])
    )
    np.testing.assert_allclose(
        float(ge2e_softmax_loss(jnp.asarray(ref))), ref_loss, rtol=1e-5
    )


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(size=20).astype(np.float32)
    targets = (rng.uniform(size=20) > 0.5).astype(np.float32)
    ref = torch.nn.BCEWithLogitsLoss(reduction="sum")(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    np.testing.assert_allclose(
        float(bce_with_logits_sum(jnp.asarray(logits), jnp.asarray(targets))),
        ref, rtol=1e-5,
    )


def test_chunk_mels_matches_reference_reshape():
    # reference train.py:181-184: pad to (max_len//150 + 1)*150 then reshape
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(3, 220, 80)).astype(np.float32)
    out = np.asarray(chunk_mels(jnp.asarray(mel), 150))
    assert out.shape == (3 * 2, 150, 80)
    np.testing.assert_allclose(out[0], mel[0, :150])
    np.testing.assert_allclose(out[1, : 220 - 150], mel[0, 150:])
    np.testing.assert_allclose(out[1, 220 - 150 :], 0.0)


@pytest.mark.smoke
def test_embedder_shapes_and_norm():
    emb = SpeechEmbedder(n_mels=20, hidden=16, n_layers=2, proj=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(6, 30, 20)), jnp.float32)
    v = emb.init(jax.random.PRNGKey(0), x)
    out = emb.apply(v, x)
    assert out["embeddings"].shape == (6, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["embeddings"]), axis=1), 1.0, atol=1e-5
    )
    assert out["da_lang_logits"].shape == (6,)


def test_ge2e_training_separates_speakers(tmp_path):
    """A few steps on separable synthetic chunks reduces the GE2E loss."""
    from masg_tpu.train.ge2e import SpeakerChunkDataset, make_ge2e_train_step

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "chunks", exist_ok=True)
    # 4 speakers x 2 langs, chunks = speaker-specific constant patterns + noise
    for s in range(4):
        base = rng.normal(size=(20, 1)) * 2.0
        chunks = (base[None] + 0.1 * rng.normal(size=(8, 20, 40))).astype(np.float32)
        lang = "ja" if s % 2 == 0 else "en"
        np.save(tmp_path / "chunks" / f"synth_spk{s}_M_{lang}.npy", chunks)

    ds = SpeakerChunkDataset(str(tmp_path / "chunks"), ["SYNTH"], m_utts=4,
                             tisv_frame=40)
    assert len(ds) == 4 and set(ds.langs) == {"en", "ja"}

    embedder = SpeechEmbedder(n_mels=20, hidden=16, n_layers=2, proj=8)
    init_state, step = make_ge2e_train_step(embedder, n_speakers=4, m_utts=4, lr=3e-3)
    mels, langs = ds.sample_batch(4, variable_length=False)
    assert mels.shape == (16, 40, 20) and langs.shape == (16,)
    state = init_state(jax.random.PRNGKey(0), mels)

    # overfit a fixed batch (random language-balanced sampling can place the
    # same speaker in two slots — as in the reference — making per-batch loss
    # non-comparable across steps)
    key = jax.random.PRNGKey(1)
    mels_j, langs_j = jnp.asarray(mels), jnp.asarray(langs)
    losses = []
    for i in range(25):
        key, sub = jax.random.split(key)
        state, loss, da = step(state, mels_j, langs_j, sub, jnp.asarray(True))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_eer_evaluation(tmp_path):
    """EER over separable synthetic speakers should be near 0; near 0.5 for
    random embeddings of identical speakers."""
    from masg_tpu.train.ge2e import SpeakerChunkDataset, evaluate_eer

    rng = np.random.default_rng(3)
    os.makedirs(tmp_path / "chunks", exist_ok=True)
    for s in range(6):
        base = rng.normal(size=(20, 1)) * 3.0
        chunks = (base[None] + 0.05 * rng.normal(size=(12, 20, 40))).astype(np.float32)
        lang = "ja" if s % 2 == 0 else "en"
        np.save(tmp_path / "chunks" / f"synth_spk{s}_M_{lang}.npy", chunks)
    ds = SpeakerChunkDataset(str(tmp_path / "chunks"), ["SYNTH"], m_utts=4,
                             tisv_frame=40)

    emb = SpeechEmbedder(n_mels=20, hidden=16, n_layers=2, proj=8)
    import jax as _jax
    params = emb.init(_jax.random.PRNGKey(0), jnp.zeros((2, 40, 20)))["params"]
    eer, thresh = evaluate_eer(emb, params, ds, n_speakers=4, m_utts=4, epochs=3)
    assert 0.0 <= eer <= 1.0
    assert 0.5 <= thresh <= 1.0


def test_da_subroutine_reduces_da_loss(tmp_path):
    from masg_tpu.train.ge2e import (SpeakerChunkDataset, make_ge2e_train_step,
                                     run_da_subroutine)
    from masg_tpu.models.speaker_encoder import bce_with_logits_sum

    rng = np.random.default_rng(5)
    os.makedirs(tmp_path / "chunks", exist_ok=True)
    # language-correlated patterns so the language head CAN learn
    for s in range(4):
        lang = "ja" if s % 2 == 0 else "en"
        base = (1.0 if lang == "ja" else -1.0) + 0.3 * rng.normal(size=(20, 1))
        chunks = (base[None] + 0.1 * rng.normal(size=(8, 20, 40))).astype(np.float32)
        np.save(tmp_path / "chunks" / f"synth_spk{s}_M_{lang}.npy", chunks)
    ds = SpeakerChunkDataset(str(tmp_path / "chunks"), ["SYNTH"], m_utts=4,
                             tisv_frame=40)
    embedder = SpeechEmbedder(n_mels=20, hidden=16, n_layers=2, proj=8)
    init_state, _ = make_ge2e_train_step(embedder, 4, 4)
    mels, langs = ds.sample_batch(4, variable_length=False)
    state = init_state(jax.random.PRNGKey(0), mels)

    def da_loss(params):
        out = embedder.apply({"params": params}, jnp.asarray(mels),
                             deterministic=True)
        return float(bce_with_logits_sum(out["da_lang_logits"], jnp.asarray(langs)))

    before = da_loss(state.embedder_params)
    state = run_da_subroutine(embedder, state, ds, 4, batches=6, max_epochs=4)
    after = da_loss(state.embedder_params)
    assert after < before, (before, after)


def test_ge2e_step_dp_mesh_equivalence(tmp_path):
    """The GE2E step under a dp-sharded batch on the 8-device mesh matches
    single-device execution (replaces the reference's NCCL DDP,
    train_speech_embedder.py:128-132); XLA all-gathers the embeddings for the
    (N, M, N) similarity automatically."""
    from masg_tpu.parallel.mesh import (data_parallel_size, make_mesh,
                                        replicate, shard_batch)
    from masg_tpu.train.ge2e import make_ge2e_train_step

    rng = np.random.default_rng(0)
    n_speakers, m_utts = 4, 4  # batch 16 -> 8-way dp shardable
    mels = rng.normal(size=(16, 40, 20)).astype(np.float32)
    langs = (np.arange(16) % 2).astype(np.float32)

    embedder = SpeechEmbedder(n_mels=20, hidden=16, n_layers=2, proj=8)
    init_state, step = make_ge2e_train_step(embedder, n_speakers, m_utts, lr=3e-3)
    state0 = init_state(jax.random.PRNGKey(0), mels)

    def run(state, place):
        losses = []
        key = jax.random.PRNGKey(1)
        for i in range(3):
            key, sub = jax.random.split(key)
            m, l = place(mels, langs)
            state, loss, da = step(state, m, l, sub, jnp.asarray(True))
            losses.append([float(loss), float(da)])
        return np.array(losses)

    ref = run(state0, lambda m, l: (jnp.asarray(m), jnp.asarray(l)))

    mesh = make_mesh(n_data=data_parallel_size(16, 8), n_model=1)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    state_r = replicate(state0, mesh)

    def place(m, l):
        b = shard_batch({"m": jnp.asarray(m), "l": jnp.asarray(l)}, mesh)
        return b["m"], b["l"]

    got = run(state_r, place)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)
