"""Perfetto-trace self-time analysis for on-device op attribution.

`jax.profiler.trace(..., create_perfetto_trace=True)` works through the
remote-TPU (axon) tunnel (round-5 discovery): the trace carries real
`/device:TPU:*` "XLA Ops" events whose SELF-times (duration minus nested
children) sum to the measured step wall time within ~1% — ground truth the
in-model ablation knobs cannot give, because `KASF_ABLATE` short-circuits
only the primal and custom-VJP backward kernels keep running (see
docs/ROUND_NOTES.md round 5: the sdpa backward kernels were 30% of the
train step, invisible to `KASF_ABLATE=attncore`).

Consumed by `python -m kasportsformer_tpu profile --analyze` and
`scripts/trace_probe.py`. ≙ the runtime tracing the reference lacks
(SURVEY.md §5.1).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re


def load_perfetto_events(logdir: str) -> list[dict]:
    """Load the newest perfetto trace under `logdir` (the layout
    `jax.profiler.trace` writes: plugins/profile/<ts>/perfetto_trace.json.gz)."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/perfetto_trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no perfetto trace under {logdir}")
    data = json.loads(gzip.open(paths[-1]).read())
    return data["traceEvents"] if isinstance(data, dict) else data


def device_self_times(events: list[dict], thread: str = "XLA Ops",
                      ) -> tuple[collections.Counter, dict[str, str]]:
    """Per-op-name SELF time (µs) on the device's `thread`, plus each op's
    HLO `long_name`. Children (interval-contained events on the same
    thread) subtract from their parent, so the values sum to device busy
    time instead of double-counting scopes (while/checkpoint/call bodies)."""
    pnames: dict = {}
    tnames: dict = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"]["name"]
            if e.get("name") == "thread_name":
                tnames[(e["pid"], e["tid"])] = e["args"]["name"]
    device_pids = {pid for pid, n in pnames.items() if "TPU" in n}

    per_tid = collections.defaultdict(list)
    long_names: dict[str, str] = {}
    for e in events:
        key = (e.get("pid"), e.get("tid"))
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and tnames.get(key) == thread):
            per_tid[key].append((e["ts"], e["ts"] + e.get("dur", 0),
                                 e["name"]))
            if e["name"] not in long_names:
                long_names[e["name"]] = e.get("args", {}).get("long_name", "")

    self_us: collections.Counter = collections.Counter()
    for _tid, evs in per_tid.items():
        evs.sort(key=lambda x: (x[0], -(x[1] - x[0])))
        stack: list[list] = []  # [end, name, child_sum, dur]

        def close(frame):
            self_us[frame[1]] += frame[3] - frame[2]

        for ts, te, name in evs:
            while stack and stack[-1][0] <= ts:
                close(stack.pop())
            if stack:
                stack[-1][2] += te - ts
            stack.append([te, name, 0.0, te - ts])
        while stack:
            close(stack.pop())
    return self_us, long_names


def classify(name: str, long_name: str) -> str:
    """Group an HLO op for reporting; Pallas custom-calls are classified by
    their output signature (this framework's kernels)."""
    head = long_name.split("custom-call(")[0] if "custom-call(" in long_name \
        else ""
    if head:
        n_out = head.count("[")
        flag = ",128]{2,1,0:T(1,128)" in head  # the (B,1,128) denom flag
        if n_out >= 4 and flag:
            return "pallas sdpa BWD kernel (dq,dk,dv,flag)"
        if n_out == 2 and flag:
            return "pallas sdpa FWD kernel (out,flag)"
        if n_out == 1:
            return "pallas fused LN-MLP FWD kernel"
        return "pallas custom-call (other)"
    if "fusion(" in long_name and re.search(
            r"f32\[\d+,128,512\]", long_name.split("fusion(")[0] or ""):
        return "MLP BWD kernel + scan grad-accum fusion"
    return re.sub(r"[.\d]+$", "", name)


def self_time_table(logdir: str, steps: int = 1, top: int = 20) -> str:
    """Human-readable per-group self-time table for the newest trace."""
    events = load_perfetto_events(logdir)
    self_us, long_names = device_self_times(events)
    total = sum(self_us.values())
    grouped: collections.Counter = collections.Counter()
    for name, us in self_us.items():
        grouped[classify(name, long_names.get(name, ""))] += us
    lines = [f"device self-time: {total / steps / 1e3:.1f} ms/step "
             f"({len(self_us)} distinct ops)"]
    for name, us in grouped.most_common(top):
        lines.append(f"  {us / steps / 1e3:8.2f} ms/step  {name}")
    return "\n".join(lines)
