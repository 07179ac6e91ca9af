"""Warm-time summary of a lowdens-r5 sweep directory.

Prints, per (num_agents, planner) cell: success rate, mean/median warm
planning time (planning_time - jit_compile_time; compile excluded per the
PARITY latency-honesty convention), and mean CT expansions. Used to build
the PARITY low-density XECBS-vs-ECBS tables (VERDICT r4 item 2).
"""
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

root = sys.argv[1] if len(sys.argv) > 1 else "results/lowdens-r5-EnvHighways2D"
rows = {}
for f in glob.glob(os.path.join(root, "**", "results.pkl"), recursive=True):
    r = pickle.load(open(f, "rb"))
    tc = r.trial_config
    key = (tc.num_agents, tc.multi_agent_planner_class)
    rows.setdefault(key, []).append(r)
for key in sorted(rows):
    rs = rows[key]
    warm = [x.planning_time - x.jit_compile_time for x in rs]
    succ = np.mean([str(x.success_status).endswith("SUCCESS") for x in rs])
    print(f"n={key[0]:2d} {key[1]:6s} trials={len(rs)} success={succ:.2f} "
          f"warm_mean={np.mean(warm):.2f}s warm_med={np.median(warm):.2f}s "
          f"exp={np.mean([x.num_ct_expansions for x in rs]):.1f}")
