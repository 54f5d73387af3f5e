"""Round-5 TPU session 3 — row-lane stage-kernel A/B at B=8/4/2 (int8 LM),
plus an int4f-LM B=8 check (the r3 "int8 beats int4 at batch" finding
predates the composed int4k+fs config; int4f halves exactly the FFN reads
that dominate the 3.26 ms B=8 LM limb)."""
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


section("rowlane_ab.py", ["8"])
section("rowlane_ab.py", ["4"])
section("rowlane_ab.py", ["2"])
section("rowlane_ab.py", ["8", "int4f"])
section("fold_conv_ab.py", ["1"])
print("### session3 complete", flush=True)
