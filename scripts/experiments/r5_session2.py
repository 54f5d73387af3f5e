"""Round-5 TPU session 2 — lane-packed folded-conv A/B at B=4, B=8, B=1
(one process; see r5_session1.py for the wedge rationale)."""
import gc
import runpy
import sys
import os
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def section(name, argv):
    print(f"\n### {name} argv={argv} t={time.strftime('%H:%M:%S')}", flush=True)
    sys.argv = [os.path.join(HERE, name)] + argv
    t0 = time.perf_counter()
    try:
        runpy.run_path(os.path.join(HERE, name), run_name="__main__")
    except Exception as e:
        print(f"### {name} FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"### {name} done in {time.perf_counter()-t0:.0f}s", flush=True)
    gc.collect()


section("lane_pack_ab.py", ["4"])
section("lane_pack_ab.py", ["8"])
section("lane_pack_ab.py", ["1"])
section("bf16_tok_probe.py", [])
print("### session2 complete", flush=True)
