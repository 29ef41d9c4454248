"""torch FastSpeech2 checkpoint -> masg_tpu flax params conversion.

Lets users of the reference load their trained checkpoints
(torch.save({'model': state_dict, ...}) from train.py:271-285) into this
framework. tests/test_torch_parity.py proves bit-level forward equivalence
between the reference torch model and our flax model under this mapping.

Layout notes:
- torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose;
- torch Conv1d weight (out, in, k) -> flax Conv kernel (k, in, out);
- torch nn.Embedding(padding_idx=0) rows load as-is (our PaddedEmbed masks
  row 0 at lookup, reproducing the frozen-zero row);
- PostNet BatchNorm running stats map into the flax batch_stats collection;
- positional tables and pitch/energy bin buffers are recomputed, not loaded.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _lin(sd, prefix):
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _conv(sd, prefix):
    out = {"kernel": np.transpose(np.asarray(sd[prefix + ".weight"]), (2, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _fft_block(sd, prefix):
    return {
        "slf_attn": {
            "w_qs": _lin(sd, prefix + ".slf_attn.w_qs"),
            "w_ks": _lin(sd, prefix + ".slf_attn.w_ks"),
            "w_vs": _lin(sd, prefix + ".slf_attn.w_vs"),
            "fc": _lin(sd, prefix + ".slf_attn.fc"),
            "layer_norm": _ln(sd, prefix + ".slf_attn.layer_norm"),
        },
        "pos_ffn": {
            "w_1": _conv(sd, prefix + ".pos_ffn.w_1"),
            "w_2": _conv(sd, prefix + ".pos_ffn.w_2"),
            "layer_norm": _ln(sd, prefix + ".pos_ffn.layer_norm"),
        },
    }


def _variance_predictor(sd, prefix):
    return {
        "conv1d_1": _conv(sd, prefix + ".conv_layer.conv1d_1.conv"),
        "layer_norm_1": _ln(sd, prefix + ".conv_layer.layer_norm_1"),
        "conv1d_2": _conv(sd, prefix + ".conv_layer.conv1d_2.conv"),
        "layer_norm_2": _ln(sd, prefix + ".conv_layer.layer_norm_2"),
        "linear_layer": _lin(sd, prefix + ".linear_layer"),
    }


def _lstm_cell(sd, prefix, sfx="", bias_mode="sum"):
    """torch nn.LSTMCell / nn.LSTM layer -> flax OptimizedLSTMCell params.
    `sfx` selects an nn.LSTM layer ("_l0", "_l1", ...); empty for LSTMCell.
    The two torch biases fold into one (forward-identical; see train/optim.py
    double_lstm_bias_updates for the matching update-math compat).

    bias_mode: "sum" for WEIGHTS (the folded bias is b_ih + b_hh); "mean"
    for Adam MOMENTS — both torch biases carry identical moments, and the
    folded parameter's moment equals each of them, not their sum."""
    wi = np.asarray(sd[f"{prefix}.weight_ih{sfx}"])  # (4H, in)
    wh = np.asarray(sd[f"{prefix}.weight_hh{sfx}"])  # (4H, H)
    b = (np.asarray(sd[f"{prefix}.bias_ih{sfx}"])
         + np.asarray(sd[f"{prefix}.bias_hh{sfx}"]))
    if bias_mode == "mean":
        b = b / 2.0
    h = wh.shape[1]
    cell: Dict[str, Any] = {}
    for gi, g in enumerate(["i", "f", "g", "o"]):  # torch gate order i,f,g,o
        sl = slice(gi * h, (gi + 1) * h)
        cell[f"i{g}"] = {"kernel": wi[sl].T}
        cell[f"h{g}"] = {"kernel": wh[sl].T, "bias": b[sl]}
    return cell


def convert_torch_jdit(sd, bias_mode="sum") -> Dict[str, Any]:
    """jdit.decoder.* torch keys (reference model/jdit.py:238-520 Tacotron2
    teacher) -> our models/jdit.py param tree (prenet + memory_layer at the
    decoder level, everything per-frame under the scanned 'step' module)."""
    d = "jdit.decoder"
    return {
        "decoder": {
            "prenet": {
                "linear_0": _lin(sd, f"{d}.prenet.layers.0.linear_layer"),
                "linear_1": _lin(sd, f"{d}.prenet.layers.1.linear_layer"),
            },
            "memory_layer": _lin(
                sd, f"{d}.attention_layer.memory_layer.linear_layer"),
            "step": {
                "attention_rnn": _lstm_cell(sd, f"{d}.attention_rnn",
                                            bias_mode=bias_mode),
                "decoder_rnn": _lstm_cell(sd, f"{d}.decoder_rnn",
                                          bias_mode=bias_mode),
                "query_layer": _lin(
                    sd, f"{d}.attention_layer.query_layer.linear_layer"),
                "v": _lin(sd, f"{d}.attention_layer.v.linear_layer"),
                "location_conv": _conv(
                    sd, f"{d}.attention_layer.location_layer.location_conv.conv"),
                "location_dense": _lin(
                    sd,
                    f"{d}.attention_layer.location_layer.location_dense.linear_layer"),
                "linear_projection": _lin(sd, f"{d}.linear_projection.linear_layer"),
                "gate_layer": _lin(sd, f"{d}.gate_layer.linear_layer"),
            },
        }
    }


def convert_torch_fastspeech2(
    state_dict: Dict[str, Any],
    encoder_layers: int,
    decoder_layers: int,
    multi_speaker: bool = True,
    postnet_convs: int = 5,
    lstm_bias_mode: str = "sum",
) -> Tuple[dict, dict]:
    """Reference state_dict -> (params, batch_stats) for our FastSpeech2."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    enc = {"src_word_emb": {"table": {"embedding": sd["encoder.src_word_emb.weight"]}}}
    if "encoder.src_accent_emb.weight" in sd:
        enc["src_accent_emb"] = {"table": {"embedding": sd["encoder.src_accent_emb.weight"]}}
    for i in range(encoder_layers):
        enc[f"layer_{i}"] = _fft_block(sd, f"encoder.layer_stack.{i}")
    params["encoder"] = enc

    dec = {}
    for i in range(decoder_layers):
        dec[f"layer_{i}"] = _fft_block(sd, f"decoder.layer_stack.{i}")
    params["decoder"] = dec

    params["variance_adaptor"] = {
        "duration_predictor": _variance_predictor(sd, "variance_adaptor.duration_predictor"),
        "pitch_predictor": _variance_predictor(sd, "variance_adaptor.pitch_predictor"),
        "energy_predictor": _variance_predictor(sd, "variance_adaptor.energy_predictor"),
        "pitch_embedding": {"embedding": sd["variance_adaptor.pitch_embedding.weight"]},
        "energy_embedding": {"embedding": sd["variance_adaptor.energy_embedding.weight"]},
    }

    params["mel_linear"] = _lin(sd, "mel_linear")

    postnet_p: Dict[str, Any] = {}
    postnet_bs: Dict[str, Any] = {}
    for i in range(postnet_convs):
        postnet_p[f"conv_{i}"] = _conv(sd, f"postnet.convolutions.{i}.0.conv")
        postnet_p[f"bn_{i}"] = {
            "scale": sd[f"postnet.convolutions.{i}.1.weight"],
            "bias": sd[f"postnet.convolutions.{i}.1.bias"],
        }
        # absent when converting Adam-moment dicts (buffers have no moments)
        if f"postnet.convolutions.{i}.1.running_mean" in sd:
            postnet_bs[f"bn_{i}"] = {
                "mean": sd[f"postnet.convolutions.{i}.1.running_mean"],
                "var": sd[f"postnet.convolutions.{i}.1.running_var"],
            }
    params["postnet"] = postnet_p
    batch_stats["postnet"] = postnet_bs

    if "jdit.decoder.attention_rnn.weight_ih" in sd:
        params["jdit"] = convert_torch_jdit(sd, bias_mode=lstm_bias_mode)

    if multi_speaker and "speaker_emb.weight" in sd:
        params["speaker_emb"] = {"embedding": sd["speaker_emb.weight"]}
        params["speaker_enc"] = {
            "pi_linear": _lin(sd, "speaker_enc.pi_linear.0"),
            "sigma_linear": _lin(sd, "speaker_enc.sigma_linear.0"),
            "mu_linear": _lin(sd, "speaker_enc.mu_linear"),
        }

    return params, batch_stats


def load_torch_checkpoint(path: str, encoder_layers: int, decoder_layers: int,
                          multi_speaker: bool = True) -> Tuple[dict, dict]:
    """Load a reference {step}.pth.tar checkpoint file."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    # strip DataParallel 'module.' prefixes (reference train.py:272-275)
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    return convert_torch_fastspeech2(sd, encoder_layers, decoder_layers, multi_speaker)


# ---------------------------------------------------------------------------
# Reverse conversion: masg_tpu -> reference torch checkpoint
# ---------------------------------------------------------------------------


def _lin_out(out, prefix, p):
    out[prefix + ".weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        out[prefix + ".bias"] = np.asarray(p["bias"])


def _conv_out(out, prefix, p):
    out[prefix + ".weight"] = np.transpose(np.asarray(p["kernel"]), (2, 1, 0))
    if "bias" in p:
        out[prefix + ".bias"] = np.asarray(p["bias"])


def _ln_out(out, prefix, p):
    out[prefix + ".weight"] = np.asarray(p["scale"])
    out[prefix + ".bias"] = np.asarray(p["bias"])


def _fft_block_out(out, prefix, p):
    for k in ("w_qs", "w_ks", "w_vs", "fc"):
        _lin_out(out, f"{prefix}.slf_attn.{k}", p["slf_attn"][k])
    _ln_out(out, f"{prefix}.slf_attn.layer_norm", p["slf_attn"]["layer_norm"])
    _conv_out(out, f"{prefix}.pos_ffn.w_1", p["pos_ffn"]["w_1"])
    _conv_out(out, f"{prefix}.pos_ffn.w_2", p["pos_ffn"]["w_2"])
    _ln_out(out, f"{prefix}.pos_ffn.layer_norm", p["pos_ffn"]["layer_norm"])


def _variance_predictor_out(out, prefix, p):
    _conv_out(out, f"{prefix}.conv_layer.conv1d_1.conv", p["conv1d_1"])
    _ln_out(out, f"{prefix}.conv_layer.layer_norm_1", p["layer_norm_1"])
    _conv_out(out, f"{prefix}.conv_layer.conv1d_2.conv", p["conv1d_2"])
    _ln_out(out, f"{prefix}.conv_layer.layer_norm_2", p["layer_norm_2"])
    _lin_out(out, f"{prefix}.linear_layer", p["linear_layer"])


def _lstm_cell_out(out, prefix, cell, sfx="", halve_bias=True):
    """Inverse of _lstm_cell: flax folded-bias cell -> torch two-bias layout.
    The folded bias splits evenly (bias_ih = bias_hh = B/2) — exact for the
    reference GE2E stack (zero-init keeps both biases equal forever) and for
    any checkpoint trained here, where only the sum is ever defined.
    halve_bias=False for Adam MOMENTS: each torch bias carries the folded
    parameter's moment verbatim."""
    wi = np.concatenate([np.asarray(cell[f"i{g}"]["kernel"]).T
                         for g in ("i", "f", "g", "o")], axis=0)
    wh = np.concatenate([np.asarray(cell[f"h{g}"]["kernel"]).T
                         for g in ("i", "f", "g", "o")], axis=0)
    b = np.concatenate([np.asarray(cell[f"h{g}"]["bias"])
                        for g in ("i", "f", "g", "o")], axis=0)
    if halve_bias:
        b = b / 2.0
    out[f"{prefix}.weight_ih{sfx}"] = wi
    out[f"{prefix}.weight_hh{sfx}"] = wh
    out[f"{prefix}.bias_ih{sfx}"] = b
    out[f"{prefix}.bias_hh{sfx}"] = b


def export_torch_fastspeech2(params, batch_stats=None,
                             lstm_halve_bias=True) -> Dict[str, Any]:
    """masg_tpu FastSpeech2 params (+batch_stats) -> reference torch
    state_dict fragment (numpy arrays), the exact inverse of
    convert_torch_fastspeech2. Covers every key the converter consumes; the
    reference's derived buffers (positional tables, pitch/energy bins,
    BatchNorm num_batches_tracked) are not parameters and are reconstructed
    by the torch model itself — update an existing state_dict with this
    fragment, or load with strict=False.

    Because the tree structure of Adam moments matches the params exactly
    (and the layout transposes are per-coordinate), passing a moment tree as
    `params` yields the name->moment mapping used for optimizer export."""
    out: Dict[str, Any] = {}
    enc = params["encoder"]
    out["encoder.src_word_emb.weight"] = np.asarray(enc["src_word_emb"]["table"]["embedding"])
    if "src_accent_emb" in enc:
        out["encoder.src_accent_emb.weight"] = np.asarray(
            enc["src_accent_emb"]["table"]["embedding"])
    for name, prefix in (("encoder", "encoder"), ("decoder", "decoder")):
        tree = params[name]
        for k, v in tree.items():
            if k.startswith("layer_"):
                _fft_block_out(out, f"{prefix}.layer_stack.{k[len('layer_'):]}", v)

    va = params["variance_adaptor"]
    for vp in ("duration_predictor", "pitch_predictor", "energy_predictor"):
        _variance_predictor_out(out, f"variance_adaptor.{vp}", va[vp])
    out["variance_adaptor.pitch_embedding.weight"] = np.asarray(
        va["pitch_embedding"]["embedding"])
    out["variance_adaptor.energy_embedding.weight"] = np.asarray(
        va["energy_embedding"]["embedding"])

    _lin_out(out, "mel_linear", params["mel_linear"])

    pn = params["postnet"]
    n_convs = sum(1 for k in pn if k.startswith("conv_"))
    for i in range(n_convs):
        _conv_out(out, f"postnet.convolutions.{i}.0.conv", pn[f"conv_{i}"])
        out[f"postnet.convolutions.{i}.1.weight"] = np.asarray(pn[f"bn_{i}"]["scale"])
        out[f"postnet.convolutions.{i}.1.bias"] = np.asarray(pn[f"bn_{i}"]["bias"])
        if batch_stats is not None:
            bs = batch_stats["postnet"][f"bn_{i}"]
            out[f"postnet.convolutions.{i}.1.running_mean"] = np.asarray(bs["mean"])
            out[f"postnet.convolutions.{i}.1.running_var"] = np.asarray(bs["var"])

    if "jdit" in params:
        d = params["jdit"]["decoder"]
        _lin_out(out, "jdit.decoder.prenet.layers.0.linear_layer", d["prenet"]["linear_0"])
        _lin_out(out, "jdit.decoder.prenet.layers.1.linear_layer", d["prenet"]["linear_1"])
        _lin_out(out, "jdit.decoder.attention_layer.memory_layer.linear_layer",
                 d["memory_layer"])
        st = d["step"]
        _lstm_cell_out(out, "jdit.decoder.attention_rnn", st["attention_rnn"],
                       halve_bias=lstm_halve_bias)
        _lstm_cell_out(out, "jdit.decoder.decoder_rnn", st["decoder_rnn"],
                       halve_bias=lstm_halve_bias)
        _lin_out(out, "jdit.decoder.attention_layer.query_layer.linear_layer",
                 st["query_layer"])
        _lin_out(out, "jdit.decoder.attention_layer.v.linear_layer", st["v"])
        _conv_out(out, "jdit.decoder.attention_layer.location_layer.location_conv.conv",
                  st["location_conv"])
        _lin_out(out,
                 "jdit.decoder.attention_layer.location_layer.location_dense.linear_layer",
                 st["location_dense"])
        _lin_out(out, "jdit.decoder.linear_projection.linear_layer",
                 st["linear_projection"])
        _lin_out(out, "jdit.decoder.gate_layer.linear_layer", st["gate_layer"])

    if "speaker_emb" in params:
        out["speaker_emb.weight"] = np.asarray(params["speaker_emb"]["embedding"])
        se = params["speaker_enc"]
        _lin_out(out, "speaker_enc.pi_linear.0", se["pi_linear"])
        _lin_out(out, "speaker_enc.sigma_linear.0", se["sigma_linear"])
        _lin_out(out, "speaker_enc.mu_linear", se["mu_linear"])

    return out


def _find_adam_state(opt_state):
    """Locate ScaleByAdamTorchState and the lr ScaleByScheduleState inside a
    make_optimizer chain state (grad_acc_step == 1 — MultiSteps wrapping is
    not supported for torch export)."""
    import optax

    from ..train.optim import ScaleByAdamTorchState

    adam_idx = sched_idx = None
    for i, st in enumerate(opt_state):
        if isinstance(st, ScaleByAdamTorchState):
            adam_idx = i
        if isinstance(st, optax.ScaleByScheduleState):
            sched_idx = i
    if adam_idx is None:
        raise ValueError(
            "no ScaleByAdamTorchState in optimizer state (grad_acc_step>1 "
            "MultiSteps checkpoints are not exportable to the torch format)")
    return adam_idx, sched_idx


def export_torch_optimizer(opt_state, torch_model=None, betas=(0.9, 0.98),
                           eps=1e-9, weight_decay=0.0, param_names=None,
                           moments_fn=None) -> Dict[str, Any]:
    """masg_tpu optimizer state -> torch.optim.Adam state_dict, loadable by
    the reference's ScheduledOptim (reference train.py:66-73,276-285 saves
    optimizer._optimizer.state_dict() and restores it on resume). The step
    count maps 1:1 (both sides count applied updates)."""
    import torch

    adam_idx, _ = _find_adam_state(opt_state)
    adam = opt_state[adam_idx]
    fn = moments_fn or (lambda t: export_torch_fastspeech2(
        t, lstm_halve_bias=False))
    mu = fn(adam.mu)
    nu = fn(adam.nu)
    count = int(adam.count)

    state = {}
    names = (param_names if param_names is not None
             else [n for n, _ in torch_model.named_parameters()])
    for i, n in enumerate(names):
        # requires_grad=False "parameters" (the reference registers its
        # positional tables and pitch/energy bins that way) never receive
        # grads, so torch Adam holds no state for them — skip, as a native
        # torch checkpoint would
        if n not in mu:
            continue
        state[i] = {
            "step": torch.tensor(float(count)),
            "exp_avg": torch.from_numpy(np.ascontiguousarray(mu[n])),
            "exp_avg_sq": torch.from_numpy(np.ascontiguousarray(nu[n])),
        }
    return {
        "state": state,
        "param_groups": [{
            "lr": 0.0,  # ScheduledOptim overwrites per step
            "betas": tuple(betas), "eps": eps, "weight_decay": weight_decay,
            "amsgrad": False, "maximize": False, "foreach": None,
            "capturable": False, "differentiable": False, "fused": None,
            "decoupled_weight_decay": False,
            "params": list(range(len(names))),
        }],
    }


def import_torch_optimizer(opt_state, torch_adam_sd, torch_model=None,
                           encoder_layers: int = None,
                           decoder_layers: int = None, param_names=None,
                           moments_fn=None):
    """torch.optim.Adam state_dict -> masg_tpu optimizer state: fills the
    Adam moments (converted through the same layout mapping as the weights)
    and both step counts (Adam bias correction + Noam schedule) into a
    freshly tx.init()-ed opt_state. Returns the new opt_state."""
    import jax

    adam_idx, sched_idx = _find_adam_state(opt_state)
    names = (param_names if param_names is not None
             else [n for n, _ in torch_model.named_parameters()])
    st = torch_adam_sd["state"]
    # grad-less params (requires_grad=False tables/bins) have no state entry
    exp_avg = {n: st[i]["exp_avg"].numpy()
               for i, n in enumerate(names) if i in st}
    exp_avg_sq = {n: st[i]["exp_avg_sq"].numpy()
                  for i, n in enumerate(names) if i in st}
    count = int(next(iter(st.values()))["step"]) if st else 0

    if moments_fn is None:
        def _n_layers(stack):
            idx = [int(k.split(".")[2]) for k in exp_avg
                   if k.startswith(f"{stack}.layer_stack.")]
            return max(idx) + 1 if idx else 0

        el = encoder_layers if encoder_layers is not None else _n_layers("encoder")
        dl = decoder_layers if decoder_layers is not None else _n_layers("decoder")
        moments_fn = lambda d: convert_torch_fastspeech2(
            d, el, dl, lstm_bias_mode="mean")[0]
    mu = moments_fn(exp_avg)
    nu = moments_fn(exp_avg_sq)

    adam = opt_state[adam_idx]
    cast = lambda new, like: jax.tree.map(
        lambda n, l: np.asarray(n, dtype=l.dtype), new, like)
    new_adam = adam._replace(
        count=np.asarray(count, np.int32),
        mu=cast(mu, adam.mu), nu=cast(nu, adam.nu))
    out = list(opt_state)
    out[adam_idx] = new_adam
    if sched_idx is not None:
        out[sched_idx] = opt_state[sched_idx]._replace(
            count=np.asarray(count, np.int32))
    return tuple(out)


# ---------------------------------------------------------------------------
# Self-contained reference-format checkpoints (no reference code needed)
# ---------------------------------------------------------------------------


def _fft_layer_param_names(prefix):
    names = []
    for m in ("w_qs", "w_ks", "w_vs", "layer_norm", "fc"):
        names += [f"{prefix}.slf_attn.{m}.weight", f"{prefix}.slf_attn.{m}.bias"]
    for m in ("w_1", "w_2", "layer_norm"):
        names += [f"{prefix}.pos_ffn.{m}.weight", f"{prefix}.pos_ffn.{m}.bias"]
    return names


def _predictor_param_names(prefix):
    names = []
    for m in ("conv_layer.conv1d_1.conv", "conv_layer.layer_norm_1",
              "conv_layer.conv1d_2.conv", "conv_layer.layer_norm_2",
              "linear_layer"):
        names += [f"{prefix}.{m}.weight", f"{prefix}.{m}.bias"]
    return names


def reference_param_order(encoder_layers: int, decoder_layers: int,
                          multi_speaker: bool = True, use_jdit: bool = False,
                          postnet_convs: int = 5):
    """The reference FastSpeech2's named_parameters() order — torch Adam
    state_dicts key their per-param state by position in this list, so a
    reference-loadable optimizer export must reproduce it exactly (incl. the
    grad-less requires_grad=False entries: position tables and bins).
    Registration order: a module's OWN Parameters list before its children's
    (position_enc/bins first within encoder/variance_adaptor). Validated
    against the live reference model in tests/test_torch_train_parity.py."""
    names = ["encoder.position_enc", "encoder.src_word_emb.weight",
             "encoder.src_accent_emb.weight"]
    for i in range(encoder_layers):
        names += _fft_layer_param_names(f"encoder.layer_stack.{i}")
    names += ["variance_adaptor.pitch_bins", "variance_adaptor.energy_bins"]
    for vp in ("duration_predictor", "pitch_predictor", "energy_predictor"):
        names += _predictor_param_names(f"variance_adaptor.{vp}")
    names += ["variance_adaptor.pitch_embedding.weight",
              "variance_adaptor.energy_embedding.weight",
              "decoder.position_enc"]
    for i in range(decoder_layers):
        names += _fft_layer_param_names(f"decoder.layer_stack.{i}")
    names += ["mel_linear.weight", "mel_linear.bias"]
    if use_jdit:
        d = "jdit.decoder"
        names += [f"{d}.prenet.layers.0.linear_layer.weight",
                  f"{d}.prenet.layers.1.linear_layer.weight"]
        names += [f"{d}.attention_rnn.{k}" for k in
                  ("weight_ih", "weight_hh", "bias_ih", "bias_hh")]
        names += [f"{d}.attention_layer.query_layer.linear_layer.weight",
                  f"{d}.attention_layer.memory_layer.linear_layer.weight",
                  f"{d}.attention_layer.v.linear_layer.weight",
                  f"{d}.attention_layer.location_layer.location_conv.conv.weight",
                  f"{d}.attention_layer.location_layer.location_dense.linear_layer.weight"]
        names += [f"{d}.decoder_rnn.{k}" for k in
                  ("weight_ih", "weight_hh", "bias_ih", "bias_hh")]
        names += [f"{d}.linear_projection.linear_layer.weight",
                  f"{d}.linear_projection.linear_layer.bias",
                  f"{d}.gate_layer.linear_layer.weight",
                  f"{d}.gate_layer.linear_layer.bias"]
    for i in range(postnet_convs):
        names += [f"postnet.convolutions.{i}.0.conv.weight",
                  f"postnet.convolutions.{i}.0.conv.bias",
                  f"postnet.convolutions.{i}.1.weight",
                  f"postnet.convolutions.{i}.1.bias"]
    if multi_speaker:
        names += ["speaker_emb.weight"]
        for m in ("pi_linear.0", "sigma_linear.0", "mu_linear"):
            names += [f"speaker_enc.{m}.weight", f"speaker_enc.{m}.bias"]
    return names


def _sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    """Reference transformer/Models.py:10-31 verbatim (f32, as
    torch.FloatTensor casts)."""
    pos = np.arange(n_position)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (hid // 2) / d_hid)
    table = np.array(angle, np.float64)
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return table.astype(np.float32)


def reference_buffers(max_seq_len: int, encoder_hidden: int, decoder_hidden: int,
                      pitch_stats, energy_stats,
                      pitch_quantization: str = "linear",
                      energy_quantization: str = "linear", n_bins: int = 256,
                      postnet_convs: int = 5) -> Dict[str, Any]:
    """The reference's derived non-trainable state_dict entries, recomputed
    from config exactly as its modules do (Models.py:39,63-65 position
    tables; modules.py:47-71 pitch/energy bins; BatchNorm
    num_batches_tracked) — makes an exported state_dict strict-loadable
    without the reference model in hand."""
    out: Dict[str, Any] = {
        "encoder.position_enc": _sinusoid_table(max_seq_len + 1,
                                                encoder_hidden)[None],
        "decoder.position_enc": _sinusoid_table(max_seq_len + 1,
                                                decoder_hidden)[None],
    }
    try:
        # bit-exact vs the reference's torch.linspace kernel; any consumer
        # of a torch checkpoint has torch installed
        import torch

        def _linspace(a, b, n):
            return torch.linspace(a, b, n).numpy()
    except ImportError:  # numpy fallback: within 1 ulp of torch's kernel
        def _linspace(a, b, n):
            return np.linspace(a, b, n).astype(np.float32)

    for key, stats, quant in (("pitch", pitch_stats, pitch_quantization),
                              ("energy", energy_stats, energy_quantization)):
        lo, hi = float(stats[0]), float(stats[1])
        if quant == "log":
            bins = np.exp(_linspace(np.log(lo), np.log(hi), n_bins - 1))
        else:
            bins = _linspace(lo, hi, n_bins - 1)
        out[f"variance_adaptor.{key}_bins"] = bins
    for i in range(postnet_convs):
        out[f"postnet.convolutions.{i}.1.num_batches_tracked"] = np.asarray(
            0, np.int64)
    return out


def export_torch_checkpoint(params, batch_stats, cfg, opt_state=None):
    """Full reference-format checkpoint dict {"model": state_dict[,
    "optimizer": adam_state_dict]} from a masg_tpu train state — the inverse
    of load_torch_checkpoint, strict-loadable by the reference's
    `model.load_state_dict(ckpt["model"])` + ScheduledOptim restore
    (reference train.py:66-73,276-285). `cfg` is our ExperimentConfig (for
    the derived buffers and the canonical parameter order)."""
    tr = cfg.model.transformer
    sd = reference_buffers(
        cfg.model.max_seq_len, tr.encoder_hidden, tr.decoder_hidden,
        cfg.stats.pitch, cfg.stats.energy,
        cfg.model.variance_embedding.pitch_quantization,
        cfg.model.variance_embedding.energy_quantization,
        cfg.model.variance_embedding.n_bins,
    )
    sd.update(export_torch_fastspeech2(params, batch_stats))
    out = {"model": sd}
    if opt_state is not None:
        names = reference_param_order(
            tr.encoder_layer, tr.decoder_layer,
            multi_speaker=cfg.model.multi_speaker,
            use_jdit=cfg.model.jdit.use_jdit,
        )
        opt = cfg.train.optimizer
        out["optimizer"] = export_torch_optimizer(
            opt_state, betas=tuple(opt.betas), eps=opt.eps,
            weight_decay=opt.weight_decay, param_names=names)
    return out


# ---------------------------------------------------------------------------
# ganlike checkpoints: {"model", "discriminator", "optimizer"}
# (reference train_ganlike.py:247-257; the single ScheduledOptim covers
# GANLike(model, discriminator).parameters() — "model.*" then
# "discriminator.*" in registration order)
# ---------------------------------------------------------------------------


def export_torch_ge2e(params, lstm_halve_bias=True) -> Dict[str, Any]:
    """Inverse of train/loop.py convert_torch_ge2e: our SpeechEmbedder params
    -> the reference GE2E submodule's state_dict keys."""
    out: Dict[str, Any] = {}
    i = 0
    while f"OptimizedLSTMCell_{i}" in params:
        _lstm_cell_out(out, "LSTM_stack", params[f"OptimizedLSTMCell_{i}"],
                       sfx=f"_l{i}", halve_bias=lstm_halve_bias)
        i += 1
    _lin_out(out, "projection.linear_layer", params["projection"])
    for j in range(2):
        if f"da_linear_{j}" in params:
            _lin_out(out,
                     f"da_classifier.classifier.layer.linear_{j}.linear_layer",
                     params[f"da_linear_{j}"])
    if "da_linear_out" in params:
        _lin_out(out, "da_classifier.classifier.layer.linear_2.linear_layer",
                 params["da_linear_out"])
    return out


def ge2e_param_order(n_layers: int = 3, use_da: bool = True):
    """Reference SpeechEmbedder named_parameters() order
    (speech_embedder_net.py:65-90: LSTM_stack, projection, da_classifier).
    Validated against the live module in tests/test_torch_export.py."""
    names = []
    for i in range(n_layers):
        names += [f"LSTM_stack.weight_ih_l{i}", f"LSTM_stack.weight_hh_l{i}",
                  f"LSTM_stack.bias_ih_l{i}", f"LSTM_stack.bias_hh_l{i}"]
    names += ["projection.linear_layer.weight", "projection.linear_layer.bias"]
    if use_da:
        for j in range(3):
            names += [
                f"da_classifier.classifier.layer.linear_{j}.linear_layer.weight",
                f"da_classifier.classifier.layer.linear_{j}.linear_layer.bias",
            ]
    return names


def _split_prefixed(d, prefix):
    return {k[len(prefix):]: v for k, v in d.items() if k.startswith(prefix)}


def export_torch_ganlike_checkpoint(params, batch_stats, cfg, opt_state=None,
                                    disc_n_layers: int = 3):
    """Full reference-format ganlike checkpoint {"model", "discriminator"[,
    "optimizer"]} from a ganlike train state (params nested as
    {"model", "discriminator"}), strict-loadable by train_ganlike.py's
    restore (:66-85)."""
    tr = cfg.model.transformer
    model_sd = reference_buffers(
        cfg.model.max_seq_len, tr.encoder_hidden, tr.decoder_hidden,
        cfg.stats.pitch, cfg.stats.energy,
        cfg.model.variance_embedding.pitch_quantization,
        cfg.model.variance_embedding.energy_quantization,
        cfg.model.variance_embedding.n_bins,
    )
    model_sd.update(export_torch_fastspeech2(params["model"], batch_stats))
    out = {"model": model_sd,
           "discriminator": export_torch_ge2e(params["discriminator"])}
    if opt_state is not None:
        names = (["model." + n for n in reference_param_order(
                     tr.encoder_layer, tr.decoder_layer,
                     multi_speaker=cfg.model.multi_speaker,
                     use_jdit=cfg.model.jdit.use_jdit)]
                 + ["discriminator." + n for n in ge2e_param_order(disc_n_layers)])

        def moments(tree):
            m = {"model." + k: v for k, v in export_torch_fastspeech2(
                tree["model"], lstm_halve_bias=False).items()}
            m.update({"discriminator." + k: v for k, v in export_torch_ge2e(
                tree["discriminator"], lstm_halve_bias=False).items()})
            return m

        opt = cfg.train.optimizer
        out["optimizer"] = export_torch_optimizer(
            opt_state, betas=tuple(opt.betas), eps=opt.eps,
            weight_decay=opt.weight_decay, param_names=names,
            moments_fn=moments)
    return out


def import_torch_ganlike_optimizer(opt_state, torch_adam_sd, cfg,
                                   discriminator):
    """torch Adam state_dict from a ganlike checkpoint -> our joint
    optimizer state ({"model", "discriminator"} moment trees)."""
    from ..train.loop import convert_torch_ge2e

    tr = cfg.model.transformer
    names = (["model." + n for n in reference_param_order(
                 tr.encoder_layer, tr.decoder_layer,
                 multi_speaker=cfg.model.multi_speaker,
                 use_jdit=cfg.model.jdit.use_jdit)]
             + ["discriminator." + n
                for n in ge2e_param_order(discriminator.n_layers)])

    def moments(d):
        mt, _ = convert_torch_fastspeech2(
            _split_prefixed(d, "model."), tr.encoder_layer, tr.decoder_layer,
            multi_speaker=cfg.model.multi_speaker, lstm_bias_mode="mean")
        dt = convert_torch_ge2e(_split_prefixed(d, "discriminator."),
                                discriminator, bias_mode="mean")
        return {"model": mt, "discriminator": dt}

    return import_torch_optimizer(opt_state, torch_adam_sd,
                                  param_names=names, moments_fn=moments)
