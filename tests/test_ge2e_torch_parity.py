"""Golden test: reference torch SpeechEmbedder -> flax conversion parity
(validates train/loop.py convert_torch_ge2e, the --use_clf discriminator
loading path)."""

import importlib
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_GE2E = "/root/reference/Multilingual-Speaker-Encoder-with-Domain-Adaptation"


class _Dot(dict):
    __getattr__ = dict.__getitem__


@pytest.fixture(scope="module")
def ref_embedder():
    """Import the reference speech_embedder_net with its hardcoded-path
    hparam module stubbed out (hparam.py:50 loads an absolute path)."""
    hp = _Dot(
        data=_Dot(nmels=80, tisv_frame=150, sr=22050, hop=256, window=1024, nfft=1024),
        model=_Dot(architecture="LSTM", hidden=256, num_layer=3, proj=64,
                   da=True, da_on="language", da_startpoint=0.0, loss="softmax"),
        train=_Dot(N=4, M=3),
    )
    pkg = types.ModuleType("refge2e")
    pkg.__path__ = [REF_GE2E]
    sys.modules["refge2e"] = pkg
    hparam_mod = types.ModuleType("refge2e.hparam")
    hparam_mod.hparam = hp
    sys.modules["refge2e.hparam"] = hparam_mod
    # utils import in speech_embedder_net pulls librosa; stub the needed names
    utils_mod = types.ModuleType("refge2e.utils")
    utils_mod.get_similarity = None
    utils_mod.get_contrast_loss = None
    utils_mod.get_softmax_loss = None
    utils_mod.count_label = lambda hp: 1
    sys.modules["refge2e.utils"] = utils_mod

    net_mod = importlib.import_module("refge2e.speech_embedder_net")
    torch.manual_seed(0)
    net = net_mod.SpeechEmbedder()
    net.eval()
    return net


def test_lstm_embedder_conversion_parity(ref_embedder):
    import jax.numpy as jnp

    from masg_tpu.models.speaker_encoder import SpeechEmbedder
    from masg_tpu.train.loop import convert_torch_ge2e

    ours = SpeechEmbedder(n_mels=80, hidden=256, n_layers=3, proj=64)
    params = convert_torch_ge2e(
        {k: v.detach().numpy() for k, v in ref_embedder.state_dict().items()},
        ours,
    )

    rng = np.random.default_rng(0)
    mels = rng.normal(size=(5, 40, 80)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_embedder(torch.from_numpy(mels))
    out = ours.apply({"params": params}, jnp.asarray(mels), deterministic=True)

    np.testing.assert_allclose(
        np.asarray(out["embeddings"]), ref_out["embeddings"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["da_lang_logits"]), ref_out["da_lang_logits"].numpy(),
        atol=1e-5,
    )
