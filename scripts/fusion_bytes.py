"""Per-fusion HBM byte attribution for a benched encoder's train step.

ROOFLINE.json says every encoder is bandwidth-bound at ~1.0x of its
current-graph HBM floor, so the only lever left is moving fewer bytes
(PERF.md "Roofline floors"). This tool names WHICH bytes: it compiles the
exact bench step (same path as `scripts/roofline.py`), takes the optimized
HLO, and charges each top-level instruction its operands+outputs — the same
accounting XLA's cost analysis uses for `bytes accessed` (fusion internals
are free; parameters/constants are HBM-resident reads).

Prints the top-N instructions by bytes with their op metadata (source line
of the jaxpr op that produced them), plus a per-source-line rollup — the
rollup is the actionable view: "nn/visnet.py:312 moves 41% of the step".

Usage: python scripts/fusion_bytes.py visnet_equihnns [n_top] [dtype]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "f8e4m3fn": 1, "f8e5m2": 1, "bf16": 2, "f16": 2,
    "f32": 4, "f64": 8, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Bytes of an HLO type string; tuples sum their elements."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        nbytes = _DTYPE_BYTES.get(dtype)
        if nbytes is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * nbytes
    return total


_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")
# the opcode token: lowercase word directly followed by "(", preceded by a
# space — layout annotations like T(8,128) / S(1) are preceded by ":" or ")"
_OPCODE_RE = re.compile(r" ([a-z][\w\-]*)\(")
_OPERAND_RE = re.compile(r"%([\w.\-]+)")


def parse_instr(ln: str):
    """(name, type_str, opcode, call_args_str) for an instruction line."""
    m = _NAME_RE.match(ln)
    if not m:
        return None
    rest = ln[m.end() - 1:]  # keep the leading space for _OPCODE_RE
    mo = _OPCODE_RE.search(rest)
    if not mo:
        return None
    type_str = rest[: mo.start()]
    # balanced-paren scan for the call's operand list
    depth = 1
    end = len(rest)
    for j in range(mo.end(), len(rest)):
        if rest[j] == "(":
            depth += 1
        elif rest[j] == ")":
            depth -= 1
            if depth == 0:
                end = j
                break
    return m.group(1), type_str, mo.group(1), rest[mo.end():end]
_META_RE = re.compile(r'metadata=\{[^}]*?source_file="([^"]+)"[^}]*?source_line=(\d+)')
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def analyze_hlo(hlo_text: str):
    """Return per-instruction byte records for the entry computation.

    Charges output bytes + operand bytes for every instruction in the entry
    computation (post-fusion, each such instruction is one kernel; its
    operands/outputs are the HBM traffic). Skips free ops (tuple/parameter/
    get-tuple-element/bitcast/constant) which don't launch kernels.
    """
    # Pass 1: symbol table name -> output bytes, across ALL computations
    # (entry operands may be defined anywhere textually, but we only need
    # shapes, which the defining line carries).
    sizes: dict[str, int] = {}
    lines = hlo_text.splitlines()
    for ln in lines:
        p = parse_instr(ln)
        if p:
            sizes[p[0]] = shape_bytes(p[1])

    # Pass 2: find the entry computation block. HLO text marks it with
    # "ENTRY %name (arg: type, ...)" ... instructions until the closing brace.
    entry_start = None
    for i, ln in enumerate(lines):
        if ln.lstrip().startswith("ENTRY "):
            entry_start = i
            break
    if entry_start is None:
        raise RuntimeError("no ENTRY computation found")
    # entry parameters are declared in the signature, not as instructions
    for pname, ptype in re.findall(
        r"%?([\w.\-]+):\s*((?:\([^=]*?\))|(?:[a-z0-9]+\[[0-9,]*\]))",
        lines[entry_start],
    ):
        sizes.setdefault(pname, shape_bytes(ptype))
    records = []
    free_ops = {
        "tuple", "get-tuple-element", "parameter", "constant", "bitcast",
        "after-all", "partition-id", "replica-id",
        # async copy pairs: charge copy-start (it moves the bytes), not -done
        "copy-done",
    }
    for ln in lines[entry_start + 1:]:
        if ln.strip() == "}":
            break
        p = parse_instr(ln)
        if not p:
            continue
        name, type_str, opcode, call_args = p
        if opcode in free_ops:
            continue
        out_b = shape_bytes(type_str)
        operand_names = _OPERAND_RE.findall(call_args)
        in_b = sum(sizes.get(o, 0) for o in operand_names)
        meta = _META_RE.search(ln)
        opn = _OPNAME_RE.search(ln)
        src = f"{os.path.basename(meta.group(1))}:{meta.group(2)}" if meta else "?"
        records.append({
            "name": name, "opcode": opcode, "out_bytes": out_b,
            "in_bytes": in_b, "bytes": out_b + in_b, "src": src,
            "op_name": opn.group(1) if opn else "", "type": type_str[:120],
        })
    return records


def main():
    method = sys.argv[1] if len(sys.argv) > 1 else "visnet_equihnns"
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"

    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from equihgnn_tpu import create_model
    from equihgnn_tpu.main import _enable_compile_cache
    from equihgnn_tpu.models.config import ModelConfig

    _enable_compile_cache()
    batches, _ = bench._make_batches(True)
    cfg = ModelConfig(
        mlp_hidden=bench.HIDDEN, output_hidden=128, all_num_layers=3,
        output_num_layers=3, aggregate="mean", normalization="ln",
        compute_dtype=dtype,
    )
    model = create_model(method, num_target=1, cfg=cfg)
    variables = jax.jit(
        lambda b: model.init(jax.random.PRNGKey(0), b, deterministic=True)
    )(batches[0])
    params = variables["params"]
    tx = optax.adam(1e-4)
    opt_state = jax.jit(tx.init)(params)

    def loss_fn(p, batch, rng):
        out = model.apply(
            {"params": p}, batch, deterministic=False, rngs={"dropout": rng}
        )
        m = batch.graph_mask.astype(out.dtype)
        return jnp.sum((out - batch.y) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)

    @jax.jit
    def step(p, s, batch, rng):
        l, g = jax.value_and_grad(loss_fn)(p, batch, rng)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    rng = jax.random.key(1, impl="rbg")
    compiled = step.lower(params, opt_state, batches[0], rng).compile()
    hlo = compiled.as_text()
    records = analyze_hlo(hlo)
    total = sum(r["bytes"] for r in records)
    print(f"== {method} ({dtype}) — {len(records)} kernels, "
          f"{total / 1e9:.1f} GB/step (operand+output model) ==")

    records.sort(key=lambda r: -r["bytes"])
    print(f"\n-- top {n_top} kernels --")
    for r in records[:n_top]:
        print(f"{r['bytes'] / 1e9:7.2f} GB  {r['opcode']:<18} {r['src']:<28} "
              f"{r['type'][:60]}  {r['op_name'][:70]}")

    rollup = collections.Counter()
    for r in records:
        rollup[r["src"]] += r["bytes"]
    print("\n-- rollup by source line --")
    for src, b in rollup.most_common(25):
        print(f"{b / 1e9:7.2f} GB  ({100 * b / total:4.1f}%)  {src}")


if __name__ == "__main__":
    main()
