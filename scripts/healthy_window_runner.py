"""Bank TPU measurements the moment the tunnel turns healthy.

The axon transport oscillates between healthy windows (4 MB fetch ~40 ms)
and degraded/wedged windows (seconds-to-minutes per read) on a cadence of
minutes to hours. Device timings taken in a sick window are meaningless, so
this runner loops: probe → if healthy, run the measurement battery ONCE per
stage → exit when everything has run (or the lifetime budget expires).

Each stage runs in a FRESH subprocess (a wedged backend poisons the process)
and its stdout/stderr land in .bench_runs/<stage>.log; the probe result
history goes to .bench_runs/probe.log. Stages, in order:

  vit_op_micro   — per-op ViT dissector incl. the r4 transpose-free kernel
  profile_vlog   — one-vlog ingest stage profile
  bench          — the full bench.py (writes BENCH_DETAIL/BENCH_LOCAL itself)

Usage: nohup python scripts/healthy_window_runner.py [lifetime_s] &
Kill via .bench_runs/runner.pid.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".bench_runs")
os.makedirs(OUT, exist_ok=True)
LIFETIME = float(sys.argv[1]) if len(sys.argv) > 1 else 4 * 3600.0
DEADLINE = time.monotonic() + LIFETIME

with open(os.path.join(OUT, "runner.pid"), "w") as f:
    f.write(str(os.getpid()))

PROBE = r"""
import time, sys, jax, jax.numpy as jnp
x = jnp.ones((1024, 1024), jnp.float32)
x.block_until_ready()
dts = []
for i in range(4):
    t0 = time.perf_counter()
    import numpy as np
    np.asarray(x + i)
    dts.append(time.perf_counter() - t0)
    print(f"probe {dts[-1]*1000:.0f} ms", flush=True)
# the FIRST read often absorbs the wedge-clear (observed 68s then 141 ms);
# judge the last 3 at a 250 ms bar — marginal windows still beat no window,
# and every stage carries its own transport tally for labeling
ok = sum(1 for d in dts[1:] if d < 0.25)
sys.exit(0 if ok >= 2 else 1)
"""

ALL_STAGES = [
    ("fused_dbg", [sys.executable, "-u", os.path.join(REPO, "scripts", "fused_dbg.py")], 900),
    ("attn_dbg", [sys.executable, "-u", os.path.join(REPO, "scripts", "attn_dbg.py")], 1200),
    ("attn_opt_probe", [sys.executable, "-u", os.path.join(REPO, "scripts", "attn_opt_probe.py")], 600),
    ("mlp_fused_micro", [sys.executable, "-u", os.path.join(REPO, "scripts", "mlp_fused_micro.py")], 1200),
    ("vit_op_micro", [sys.executable, os.path.join(REPO, "scripts", "vit_op_micro.py")], 1500),
    ("asr_micro", [sys.executable, "-u", os.path.join(REPO, "scripts", "asr_micro.py")], 1500),
    ("tower_ab", [sys.executable, "-u", os.path.join(REPO, "scripts", "tower_ab.py")], 1500),
    ("clip30_micro", [sys.executable, "-u", os.path.join(REPO, "scripts", "clip30_micro.py")], 1200),
    ("profile_vlog", [sys.executable, os.path.join(REPO, "scripts", "profile_vlog.py")], 1800),
    ("long_ingest", [sys.executable, "-u", os.path.join(REPO, "scripts", "long_ingest.py"), "--minutes", "60"], 2000),
    ("bench", [sys.executable, os.path.join(REPO, "bench.py")], 2400),
]
# optional 2nd arg: comma-separated stage subset, e.g. "mlp_fused_micro,bench"
if len(sys.argv) > 2:
    want = set(sys.argv[2].split(","))
    STAGES = [s for s in ALL_STAGES if s[0] in want]
else:
    STAGES = [s for s in ALL_STAGES if s[0] != "mlp_fused_micro"]
done = {name: False for name, _, _ in STAGES}
fails = {name: 0 for name, _, _ in STAGES}
MAX_FAILS = 2  # a deterministically-failing stage must not starve later ones


def log(msg: str) -> None:
    with open(os.path.join(OUT, "probe.log"), "a") as f:
        f.write(f"[t+{time.monotonic() - (DEADLINE - LIFETIME):8.0f}s] {msg}\n")


log(f"runner started, lifetime {LIFETIME:.0f}s")
while time.monotonic() < DEADLINE and not all(done.values()):
    try:
        p = subprocess.run([sys.executable, "-c", PROBE], timeout=120,
                           capture_output=True, text=True, cwd=REPO)
        healthy = p.returncode == 0
        log(f"probe healthy={healthy}: {' '.join(p.stdout.split())[:120]}")
    except subprocess.TimeoutExpired:
        healthy = False
        log("probe TIMED OUT (wedged)")
    if not healthy:
        time.sleep(180)
        continue
    for name, cmd, budget in STAGES:
        if done[name] or fails[name] >= MAX_FAILS:
            continue
        if time.monotonic() + budget > DEADLINE + 600:
            continue
        log(f"running {name} (budget {budget}s)")
        with open(os.path.join(OUT, f"{name}.log"), "w") as lf:
            try:
                rc = subprocess.run(cmd, timeout=budget, stdout=lf,
                                    stderr=subprocess.STDOUT, cwd=REPO).returncode
            except subprocess.TimeoutExpired:
                rc = -9
        log(f"{name} rc={rc}")
        if rc == 0:
            done[name] = True
        else:
            fails[name] += 1
        # re-probe between stages: a window can close mid-battery
        break
log(f"runner exiting: done={json.dumps(done)} fails={json.dumps(fails)}")
