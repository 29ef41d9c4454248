"""Itemize the train step's HBM traffic per op (VERDICT r4 item 5).

BENCH_r03 diagnosed the 49% MFU as activation-HBM-bound (105 FLOP/byte,
21.5 GB/step) but never NAMED the byte consumers. This walks the optimized
HLO of the jitted bf16 train step (the exact bench.py configuration:
35M params, B=16, L=128, T=896, rbg dropout) and charges every top-level
instruction its operand+output bytes — fusions internalize their
intermediates, so top-level operand/result traffic ~= HBM traffic — then
buckets by op kind and prints the top instructions.

    python scripts/itemize_hbm.py [--dtype bf16|f32] [--flash] [--topk 25]
"""

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "s4": 0.5, "u4": 0.5,
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> float:
    """Total bytes of an HLO shape string, incl. tuple elements."""
    total = 0.0
    for dt, dims in SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def _split_instruction(ln: str):
    """'  %name = SHAPE opcode(...)' -> (name, shape, opcode) or None.
    Shapes may carry layout braces (f32[256]{0:T(128)}) and tuple shapes
    are parenthesized with nested layout parens."""
    s = ln.strip()
    if s.startswith("ROOT "):
        s = s[5:]
    if " = " not in s or not s.startswith("%"):
        return None
    name, rhs = s.split(" = ", 1)
    if rhs.startswith("("):
        depth = 0
        for i, c in enumerate(rhs):
            depth += c == "("
            depth -= c == ")"
            if depth == 0:
                break
        shape, rest = rhs[: i + 1], rhs[i + 1:].lstrip()
    else:
        parts = rhs.split(" ", 1)
        if len(parts) != 2:
            return None
        shape, rest = parts
    op = rest.split("(", 1)[0].strip()
    if not op or not re.fullmatch(r"[\w-]+", op):
        return None
    return name.strip(), shape, op


def parse_entry_instructions(hlo: str):
    """Yield (name, result_shape, opcode, line) for the ENTRY computation's
    top-level instructions."""
    in_entry = False
    for ln in hlo.split("\n"):
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry:
            if ln.startswith("}"):
                return
            parsed = _split_instruction(ln)
            if parsed:
                yield parsed[0], parsed[1], parsed[2], ln


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--topk", type=int, default=25)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_inputs, _flagship
    from masg_tpu.core.cache import enable_compilation_cache
    from masg_tpu.models import FastSpeech2
    from masg_tpu.train.optim import make_optimizer
    from masg_tpu.train.state import create_train_state
    from masg_tpu.train.step import make_train_step

    enable_compilation_cache()
    cfg = _flagship()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = FastSpeech2.from_config(cfg, dtype=dtype, use_flash=args.flash)
    b = _example_inputs(B=16, L=128, T=896)
    T = b["mels"].shape[1]
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["speakers"], batch["texts"], batch["src_lens"], T,
        mels=batch["mels"], mel_lens=batch["mel_lens"],
        p_targets=batch["pitches"], e_targets=batch["energies"],
        d_targets=batch["durations"], accents=batch["accents"],
        speaker_meta=batch["speaker_meta"])
    tx = make_optimizer(cfg.train.optimizer, cfg.model.transformer.encoder_hidden)
    state = create_train_state(model, variables, tx)
    step_fn = make_train_step(model, rng_impl="rbg")
    rng = jax.random.key(1, impl="rbg")

    compiled = jax.jit(step_fn).lower(
        state, batch, jax.random.fold_in(rng, 0)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(f"# XLA cost analysis: {cost.get('flops', 0)/1e9:.1f} GFLOP, "
          f"{cost.get('bytes accessed', 0)/1e9:.2f} GB accessed")
    mem = compiled.memory_analysis()
    if mem is not None:
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                print(f"# memory_analysis.{k}: {v/1e9:.3f} GB")

    hlo = compiled.as_text()
    by_kind = defaultdict(float)
    rows = []
    operand_shapes = {}  # instruction name -> result shape string

    # first pass: record result shapes of every instruction in entry
    entry_instrs = list(parse_entry_instructions(hlo))
    for name, shape, op, ln in entry_instrs:
        operand_shapes[name] = shape

    for name, shape, op, ln in entry_instrs:
        if op in ("parameter", "get-tuple-element", "tuple", "constant",
                  "bitcast"):
            continue
        out_b = shape_bytes(shape)
        # operand bytes: every %ref in the call args that resolves to an
        # entry instruction (computation refs like calls=%fused_x don't)
        opnd_b = 0.0
        call = ln.split(op + "(", 1)[1] if op + "(" in ln else ""
        for ref in re.findall(r"%[\w.-]+", call):
            if ref in operand_shapes:
                opnd_b += shape_bytes(operand_shapes[ref])
        total = out_b + opnd_b
        kind = op
        if op == "fusion":
            fk = re.search(r"kind=(\w+)", ln)
            kind = f"fusion.{fk.group(1)}" if fk else "fusion"
        by_kind[kind] += total
        rows.append((total, name, kind, out_b, opnd_b, ln.strip()[:140]))

    total_all = sum(by_kind.values())
    print(f"\n# top-level operand+result traffic: {total_all/1e9:.2f} GB "
          f"(upper bound on HBM; reused buffers counted per use)")
    print("\n## by op kind")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v/1e9:8.3f} GB  {100*v/total_all:5.1f}%  {k}")

    print(f"\n## top {args.topk} instructions")
    rows.sort(reverse=True)
    for total, name, kind, out_b, opnd_b, snippet in rows[: args.topk]:
        print(f"{total/1e6:9.1f} MB (out {out_b/1e6:7.1f} + in {opnd_b/1e6:8.1f})"
              f"  {kind:18s} {snippet}")

    # --- module attribution of WRITE bytes via op_name metadata -----------
    # fusions carry metadata on inner instructions: resolve through the
    # called computation's ROOT (fallback: most frequent op_name inside)
    comp_root, comp_all = {}, defaultdict(list)
    cur = None
    for ln in hlo.split("\n"):
        m = re.match(r"^%(\S+) \(", ln)
        if m:
            cur = "%" + m.group(1)
            continue
        if cur and ln.startswith("}"):
            cur = None
            continue
        if cur:
            mm = re.search(r'op_name="([^"]+)"', ln)
            if mm:
                comp_all[cur].append(mm.group(1))
                if "ROOT" in ln:
                    comp_root[cur] = mm.group(1)

    def classify(p):
        if p is None:
            return "<none>"
        mm = re.search(r"(encoder|decoder|postnet|variance_adaptor|mel_linear"
                       r"|speaker_meta_enc|speaker_emb)", p)
        base = mm.group(1) if mm else (p.split("/")[1] if "/" in p else p)[:30]
        bwd = "bwd:" if "transpose(jvp" in p else ""
        feat = ""
        for key, label in (("softmax", "softmax"), ("mha_attention", "attn"),
                           ("dot_general", "dot"), ("conv_general", "conv"),
                           ("dropout", "dropout"), ("bernoulli", "dropout"),
                           ("norm", "ln"), ("adam", "adam")):
            if key in p:
                feat = "|" + label
                break
        return bwd + base + feat

    by_mod = defaultdict(float)
    write_total = 0.0
    for name, shape, op, ln in entry_instrs:
        if op in ("parameter", "get-tuple-element", "tuple", "constant",
                  "bitcast"):
            continue
        out_b = shape_bytes(shape)
        write_total += out_b
        meta = re.search(r'op_name="([^"]+)"', ln)
        p = meta.group(1) if meta else None
        if p is None:
            cm = re.search(r"calls=(%[\w.-]+)", ln)
            if cm:
                p = comp_root.get(cm.group(1))
                if p is None:
                    lst = comp_all.get(cm.group(1), [])
                    p = max(set(lst), key=lst.count) if lst else None
        by_mod[f"{op}:{classify(p)}"] += out_b
    print(f"\n## WRITE bytes by module (total {write_total/1e9:.2f} GB; "
          f"async-/copy-start rows are XLA's pipelined DMA of the same "
          f"buffers, counted per transfer)")
    for k, v in sorted(by_mod.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v/1e9:7.3f} GB  {100*v/write_total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
