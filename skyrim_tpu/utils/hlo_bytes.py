"""Physical-layout HBM traffic accounting from compiled (optimized) HLO.

Closes the roofline bracket (utils/roofline.py): XLA's cost model
reports *logical* bytes accessed, which over-counts fused interiors and
ignores tile padding — for DLWP it gave a [2.4 %, 556 %] HBM bracket,
useless for steering.  This module parses the post-optimization HLO of
a compiled step and charges every top-level instruction its operands'
and result's PHYSICAL bytes (tile-padded per the printed layout), the
quantity the HBM actually moves.  The reference has no analogue (its
profiling story is wall-clock timeit only, SURVEY.md §5).

Accounting rules, deliberate and documented:
  * fusion operands are charged by what the fusion BODY actually reads:
    a parameter consumed only through ``slice``/``dynamic-slice``/
    ``gather`` ops is charged the sum of those reads (capped at the
    full buffer), otherwise the full physical buffer — this closes the
    round-4 "fusion-reads-full-operand" over-count that pushed three
    models past 100 % of wall×BW;
  * top-level ``slice``/``dynamic-slice`` read only their window
    (2×result); ``gather`` reads ≈ its result rows from the source
    (min(source, result)) plus the indices; ``dynamic-update-slice``
    reads its update and writes that region in place (2×update);
  * while-loop bodies are multiplied by the trip count when the loop
    condition is the canonical ``compare(gte, constant), LT`` pattern
    (lax.scan / fori_loop lower this way), else counted once;
  * control ops (tuple plumbing, bitcasts, parameters, constants) move
    no data and are skipped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_BPE = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16, "s4": 1, "u4": 1,
}

# ops that move no HBM data (plumbing / metadata)
_SKIP_OPS = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "partition-id", "replica-id", "iota",
}

_SHAPE_RE = re.compile(
    r"(?P<dt>[a-z]\d*[a-z0-9]*)\[(?P<dims>[\d,]*)\]"
    r"(?:\{(?P<layout>[^}]*)\})?"
)


def physical_bytes(dt: str, dims: list[int], layout: str | None) -> int:
    """Tile-padded byte size of one array buffer.

    TPU tiling pads the minor physical dim to 128 lanes and the
    second-minor to 8 sublanes (f32) / 16 (2-byte) / 32 (1-byte) — the
    ``T(8,128)``, ``T(16,128)(2,1)`` … annotations in optimized HLO.
    1-D buffers print ``T(1024)``-style linear tiles; pad to that tile.
    """
    bpe = _BPE.get(dt, 4)
    if not dims:
        return bpe
    n_logical = 1
    for d in dims:
        n_logical *= d
    if n_logical == 0:
        return 0
    perm = None
    tile: tuple[int, ...] | None = None
    if layout:
        m = re.match(r"([\d,]+)", layout)
        if m and m.group(1):
            perm = [int(x) for x in m.group(1).split(",")]
        tm = re.search(r"T\((\d+)(?:,(\d+))?\)", layout)
        if tm:
            tile = tuple(int(x) for x in tm.groups() if x is not None)
    if perm is None or len(perm) != len(dims):
        perm = list(range(len(dims) - 1, -1, -1))
    # physical dims, minor first
    phys = [dims[p] for p in perm]
    if tile and len(tile) == 1:
        # linear tile (1-D layouts): pad the whole buffer to the tile
        t = tile[0]
        return -(-n_logical // t) * t * bpe
    lane_t = tile[1] if tile and len(tile) == 2 else 128
    sub_t = tile[0] if tile and len(tile) == 2 else {4: 8, 2: 16, 1: 32, 8: 4}.get(bpe, 8)
    minor = -(-phys[0] // lane_t) * lane_t
    second = phys[1] if len(phys) > 1 else 1
    second = -(-second // sub_t) * sub_t
    rest = 1
    for d in phys[2:]:
        rest *= d
    return minor * second * rest * bpe


def _shape_bytes(type_str: str) -> int:
    """Bytes of a (possibly tuple) result type string."""
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dt = m.group("dt")
        if dt not in _BPE:
            continue
        dims = [int(d) for d in m.group("dims").split(",")] if m.group("dims") else []
        total += physical_bytes(dt, dims, m.group("layout"))
    return total


@dataclass
class Instr:
    name: str
    op: str
    result_bytes: int
    operands: list[str]
    line: str
    calls: str | None = None  # fusion body computation name


@dataclass
class Computation:
    name: str
    instrs: dict[str, Instr] = field(default_factory=dict)
    whiles: list[tuple[str, str, str]] = field(default_factory=list)  # (instr, cond, body)
    is_entry: bool = False


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?(?P<name>[\w.\-]+)\s*=\s*(?P<type>\([^=]*?\)|\S+)\s+"
    r"(?P<op>[\w\-]+)\((?P<args>.*)$"
)


def parse_hlo(text: str) -> dict[str, Computation]:
    comps: dict[str, Computation] = {}
    cur: Computation | None = None
    for line in text.splitlines():
        stripped = line.strip()
        if stripped.endswith("{") and "->" in stripped and "=" not in stripped.split("->")[0].split("(")[0]:
            toks = stripped.split()
            is_entry = toks[0] == "ENTRY"
            name = (toks[1] if is_entry else toks[0]).lstrip("%").split("(")[0]
            cur = Computation(name, is_entry=is_entry)
            comps[cur.name] = cur
            continue
        if re.match(r"^\s*\}\s*,?\s*$", line):
            cur = None
            continue
        if cur is None:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, type_str, op = m.group("name"), m.group("type"), m.group("op")
        operands = re.findall(r"%([\w.\-]+)", m.group("args").split("metadata=")[0])
        inst = Instr(name, op, _shape_bytes(type_str), operands, line)
        if op == "fusion":
            fm = re.search(r"calls=%?([\w.\-]+)", line)
            if fm:
                inst.calls = fm.group(1)
        cur.instrs[name] = inst
        if op == "while":
            cm = re.search(r"condition=%?([\w.\-]+)", line)
            bm = re.search(r"body=%?([\w.\-]+)", line)
            if cm and bm:
                cur.whiles.append((name, cm.group(1), bm.group(1)))
    return comps


def _trip_count(
    comps: dict[str, Computation], cond: Computation
) -> int | None:
    """Extract N from the canonical ``compare(gte, constant(N)), LT``.

    Follows one level of ``call``/``fusion`` indirection — some XLA
    configs wrap the compare in a ``wrapped_compare_computation``."""
    consts: dict[str, int] = {}
    for i in cond.instrs.values():
        if i.op == "constant":
            m = re.search(r"constant\((-?\d+)\)", i.line)
            if m:
                consts[i.name] = int(m.group(1))

    def scan(comp: Computation, pmap: dict[str, str]) -> int | None:
        for i in comp.instrs.values():
            if i.op == "compare" and "direction=LT" in i.line:
                for o in i.operands:
                    if pmap.get(o, o) in consts:
                        return consts[pmap.get(o, o)]
        return None

    found = scan(cond, {})
    if found is not None:
        return found
    for i in cond.instrs.values():
        cm = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", i.line)
        callee = comps.get(cm.group(1)) if cm else None
        if callee is None:
            continue
        # map callee parameter names back to the caller's operands
        pmap: dict[str, str] = {}
        for inst in callee.instrs.values():
            if inst.op == "parameter":
                pm = re.search(r"parameter\((\d+)\)", inst.line)
                if pm and int(pm.group(1)) < len(i.operands):
                    pmap[inst.name] = i.operands[int(pm.group(1))]
        found = scan(callee, pmap)
        if found is not None:
            return found
    return None


_SLICING_OPS = ("slice", "dynamic-slice", "gather")


def _fusion_param_reads(body: Computation) -> int:
    """Bytes a fusion body actually reads from its parameters.

    A parameter consumed ONLY through slicing ops is charged the sum of
    those reads (capped at the full buffer); any other use charges the
    full physical buffer."""
    users: dict[str, list[Instr]] = {}
    for i in body.instrs.values():
        for o in i.operands:
            users.setdefault(o, []).append(i)
    total = 0
    for inst in body.instrs.values():
        if inst.op != "parameter":
            continue
        full = inst.result_bytes
        us = users.get(inst.name, [])
        if us and all(u.op in _SLICING_OPS for u in us):
            total += min(sum(u.result_bytes for u in us), full)
        else:
            total += full
    return total


def computation_traffic(
    comps: dict[str, Computation],
    comp: Computation,
    _depth: int = 0,
    _mult: int = 1,
    _rows: list | None = None,
) -> int:
    """Sum physical operand+result bytes over data-moving instructions,
    recursing into while bodies with trip-count multipliers.  When
    ``_rows`` is a list, appends (bytes, op, name, line) per instruction
    (bytes already multiplied by the enclosing trip counts)."""
    if _depth > 8:
        return 0
    total = 0
    for inst in comp.instrs.values():
        if inst.op in _SKIP_OPS or inst.op == "while":
            continue
        if inst.op == "fusion" and inst.calls in comps:
            b = inst.result_bytes + _fusion_param_reads(comps[inst.calls])
        elif inst.op in ("slice", "dynamic-slice"):
            b = 2 * inst.result_bytes  # reads only its window
        elif inst.op == "gather":
            src = comp.instrs.get(inst.operands[0]) if inst.operands else None
            src_b = src.result_bytes if src else 0
            idx = (
                comp.instrs.get(inst.operands[1]).result_bytes
                if len(inst.operands) > 1 and inst.operands[1] in comp.instrs
                else 0
            )
            b = inst.result_bytes + min(src_b, inst.result_bytes) + idx
        elif inst.op == "dynamic-update-slice":
            upd = (
                comp.instrs.get(inst.operands[1])
                if len(inst.operands) > 1 else None
            )
            b = 2 * (upd.result_bytes if upd else inst.result_bytes)
        else:
            b = inst.result_bytes
            for o in inst.operands:
                src = comp.instrs.get(o)
                if src is not None:
                    b += src.result_bytes
        total += b
        if _rows is not None and b:
            _rows.append((b * _mult, inst.op, inst.name, inst.line.strip()[:180]))
    for w, cond_name, body_name in comp.whiles:
        body = comps.get(body_name)
        cond = comps.get(cond_name)
        if body is None:
            continue
        trips = (_trip_count(comps, cond) if cond is not None else None) or 1
        total += trips * computation_traffic(
            comps, body, _depth + 1, _mult * trips, _rows
        )
    return total


def hlo_physical_traffic(hlo_text: str) -> dict:
    """Total physical HBM bytes of one execution of the entry computation.

    Returns {"total_bytes", "entry", "n_instructions"}.
    """
    comps = parse_hlo(hlo_text)
    entry = next((c for c in comps.values() if c.is_entry), None)
    if entry is None:
        # fall back: computation that is no while body/cond and not fused
        sub = set()
        for c in comps.values():
            for _, cond, body in c.whiles:
                sub.add(cond)
                sub.add(body)
        candidates = [
            c for n, c in comps.items()
            if not n.startswith(("fused_computation", "region", "wide."))
            and n not in sub
        ]
        entry = max(candidates or comps.values(), key=lambda c: len(c.instrs))
    # traffic recursion only follows while bodies from the entry, so no
    # name-based filtering is needed (fusion interiors are never bodies;
    # while bodies may be named region_N under some XLA configs)
    rows: list = []
    total = computation_traffic(comps, entry, _rows=rows)
    rows.sort(reverse=True)
    return {
        "total_bytes": total,
        "entry": entry.name,
        "n_instructions": len(entry.instrs),
        "top": rows[:24],
    }


def step_physical_bytes(model, params, state) -> int:
    """Physical HBM traffic of one jitted ``model.advance`` step."""
    import jax

    def step(params, state):
        s, y = model.advance(params, state)
        return s, y

    txt = jax.jit(step).lower(params, state).compile().as_text()
    return hlo_physical_traffic(txt)["total_bytes"]
