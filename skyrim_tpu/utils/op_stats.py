"""Per-op device-time breakdown for a model step (xprof-based).

The reference has no profiler integration at all (SURVEY.md §5 —
wall-clock `timeit` only); this tool captures a ``jax.profiler`` trace
of a jitted ``advance`` step and reduces it to a per-HLO-op self-time
table, the view that actually directs kernel optimization work.

Usage::

    python -m skyrim_tpu.utils.op_stats pangu [n_steps] [top_k]

Requires ``tensorboard_plugin_profile`` (present in the default image);
falls back with a clear error when missing.
"""

from __future__ import annotations

import glob
import os
import tempfile


def collect_op_stats(step_fn, args, n_steps: int = 3, logdir: str | None = None):
    """Run ``step_fn(*args)`` ``n_steps`` times under a profiler trace and
    return (rows, total_self_us) where rows are (self_us_per_step,
    fraction, total_us_per_step, op_name) sorted by descending self time.

    Self time is EXCLUSIVE: control-flow wrapper events (``conditional``,
    ``while``) on the device "XLA Ops" line SPAN the ops of the branch
    they execute, which also appear as their own events — a flat sum
    double-counts every op under a wrapper (that is exactly the
    311 ms-vs-153 ms discrepancy in PROFILE_r03.txt).  The reduction
    here subtracts nested-child time from each event, so a cond that
    executes one branch contributes ~0 self time and the per-step total
    matches the measured step wall.

    ``step_fn`` must return something whose first leaf can be fetched to
    force execution (e.g. a (state, scalar) tuple).
    """
    import jax

    logdir = logdir or tempfile.mkdtemp(prefix="skyrim_opstats_")
    out = step_fn(*args)  # warm-up / compile outside the trace
    jax.block_until_ready(out)
    jax.profiler.start_trace(logdir)
    for _ in range(n_steps):
        out = step_fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    xplanes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    tsv = _xplane_to_tsv(max(xplanes, key=os.path.getmtime))
    data = []
    for line in tsv.splitlines():
        excl_us, tot_us, name = line.split("\t", 2)
        data.append((float(excl_us), float(tot_us), name))
    data.sort(reverse=True)
    total = sum(d[0] for d in data)
    out_rows = [
        (e / n_steps, (e / total if total else 0.0), t / n_steps, nm)
        for e, t, nm in data
    ]
    return out_rows, total / n_steps


def _xplane_to_tsv(xplane_path: str) -> str:
    """Aggregate the device 'XLA Ops' line of an xplane.pb into
    ``exclusive_us<TAB>total_us<TAB>op_name`` rows.

    Wrapper events (``conditional``/``while``) span the events of the
    ops they execute; a stack walk over the time-sorted events assigns
    each event its EXCLUSIVE time (duration minus nested children), so
    nothing is counted twice.

    Parsed with the raw xplane proto (tensorflow.tsl) in a subprocess
    using the pure-Python protobuf implementation — the image's
    tensorboard_plugin_profile native converter predates the installed
    TF and its pb2 files predate the C++ protobuf runtime."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    env["JAX_PLATFORMS"] = "cpu"  # parsing needs no device
    code = (
        "import sys, collections\n"
        "from tensorflow.tsl.profiler.protobuf import xplane_pb2\n"
        "xs = xplane_pb2.XSpace()\n"
        "xs.ParseFromString(open(sys.argv[1], 'rb').read())\n"
        "excl = collections.defaultdict(float)\n"
        "tot = collections.defaultdict(float)\n"
        "def flush(stack, upto=None):\n"
        "    while stack and (upto is None or stack[-1][1] <= upto):\n"
        "        s, e, nm, child = stack.pop()\n"
        "        d = e - s\n"
        "        # clamp: a partially overlapping (non-nested) event —\n"
        "        # e.g. an async collective spanning compute — could\n"
        "        # otherwise yield negative exclusive time\n"
        "        excl[nm] += max(d - child, 0.0) / 1e6\n"
        "        tot[nm] += d / 1e6\n"
        "        if stack: stack[-1][3] += d\n"
        "for p in xs.planes:\n"
        "    if not p.name.startswith('/device:'): continue\n"
        "    md = p.event_metadata\n"
        "    for line in p.lines:\n"
        "        if line.name != 'XLA Ops': continue\n"
        "        evs = sorted(\n"
        "            ([ev.offset_ps, ev.offset_ps + ev.duration_ps,\n"
        "              md[ev.metadata_id].name, 0.0] for ev in line.events),\n"
        "            key=lambda t: (t[0], -t[1]))\n"
        "        stack = []\n"
        "        for ev in evs:\n"
        "            flush(stack, upto=ev[0])\n"
        "            stack.append(ev)\n"
        "        flush(stack)\n"
        "for name in tot:\n"
        "    print(f'{excl[name]}\\t{tot[name]}\\t{name}')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, xplane_path],
        env=env, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"xplane parsing failed: {proc.stderr[-2000:]}")
    return proc.stdout


def main(argv: list[str]) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skyrim_tpu.models import MODELS

    name = argv[0] if argv else "pangu"
    n_steps = int(argv[1]) if len(argv) > 1 else 3
    top_k = int(argv[2]) if len(argv) > 2 else 40
    model = MODELS[name]()
    params = model.init_params(jax.random.key(0))
    state = model.init_state(
        params, np.zeros(model.state_shape[1:], np.float32)
    )

    @jax.jit
    def step(params, state):
        s, y = model.advance(params, state)
        return s, jnp.mean(y)

    rows, total = collect_op_stats(step, (params, state), n_steps)
    print(
        f"{name}: {total:.0f} us/step device EXCLUSIVE self-time "
        f"(wrapper spans subtracted), top {top_k} ops:"
    )
    for excl, frac, tot, nm in rows[:top_k]:
        wrap = f" (span {tot:.0f} us)" if tot > 1.5 * max(excl, 1.0) else ""
        print(f"{excl:10.0f} us {100 * frac:5.1f}%  {nm[:110]}{wrap}")


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
