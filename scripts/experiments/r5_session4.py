"""Round-5 TPU session 4 — settle the batch LM-mode law (int4f vs int8 at
B=4/2: session 3 showed int4f BEATING int8 at B=8, 199-201.5 vs 194.5-196.7
— reversing r3's int8-at-batch rule at the composed config), then the 7B
one-chip int4f probe (VERDICT #2: int4f halves exactly the LM reads that
dominate the 7.22x int8 config; target >=10x at full 32K)."""
import gc
import os
import runpy
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def section(name, argv, env=None):
    print(f"\n### {name} argv={argv} env={env} t={time.strftime('%H:%M:%S')}",
          flush=True)
    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    sys.argv = [os.path.join(HERE, name)] + argv
    t0 = time.perf_counter()
    try:
        runpy.run_path(os.path.join(HERE, name), run_name="__main__")
    except Exception as e:
        print(f"### {name} FAILED: {type(e).__name__}: {e}", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    print(f"### {name} done in {time.perf_counter()-t0:.0f}s", flush=True)
    gc.collect()


section("rowlane_ab.py", ["4", "int4f"])
section("rowlane_ab.py", ["2", "int4f"])
section("probe_7b_one_chip.py", [],
        env={"W": "int4f", "TOK": "int4k", "KV": "int8", "FS": "1",
             "CTX": "32768"})
section("probe_7b_one_chip.py", [],
        env={"W": "int8", "TOK": "int4k", "KV": "int8", "FS": "1",
             "CTX": "32768"})
print("### session4 complete", flush=True)
