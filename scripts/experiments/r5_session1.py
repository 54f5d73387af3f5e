"""Round-5 TPU measurement session 1 — batches three VERDICT r4 items into
ONE process (the tunnel wedges 10-30 min after a process exit, so sequential
processes waste wall clock):

  1. step_parts_ablation 1 bf16   — re-attribute the bf16 B=1 residue at the
     composed r4 config (subset head live).            [VERDICT #4]
  2. head_fold_ab 1               — measure fold_head at its own operating
     point before auto-enabling it.                    [VERDICT #5]
  3. composed_ablation 8 int8     — fresh B=8 attribution at the composed
     config (int8 LM + int4k + fused stages).          [VERDICT #1]

Each sub-script builds its own params and restores its monkeypatches; we gc
between them so device buffers free before the next init.
"""
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
    except Exception as e:  # keep the session going; later sections still run
        print(f"### {name} FAILED: {type(e).__name__}: {e}", flush=True)
    print(f"### {name} done in {time.perf_counter()-t0:.0f}s", flush=True)
    gc.collect()


section("step_parts_ablation.py", ["1", "bf16"])
section("head_fold_ab.py", ["1"])
section("composed_ablation.py", ["8", "int8"])
print("### session1 complete", flush=True)
