"""Render one or more sweeps' analyzed_results.pkl as markdown tables.

Companion to the reference's combine_and_save_results_for_experiment output
(experiment_utils.py:84-196) — turns the analyzed dicts into the PARITY.md
tables (success rate / CT expansions / planning time / adherence per
agents x planner cell).
"""
import argparse
import glob
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def render_dir(path: str) -> str:
    """Render every analyzed_results*.pkl in a sweep directory."""
    pkls = sorted(glob.glob(os.path.join(path, "analyzed_results*.pkl")))
    if not pkls:
        raise FileNotFoundError(f"no analyzed_results*.pkl in {path}")
    return "\n".join(render(p) for p in pkls)


def render(pkl_path: str) -> str:
    with open(pkl_path, "rb") as f:
        analyzed = pickle.load(f)
    planners = list(next(iter(analyzed.values())).keys())
    name = os.path.basename(pkl_path)[len("analyzed_results"):-len(".pkl")]
    name = name.strip("_") or os.path.basename(
        os.path.dirname(os.path.abspath(pkl_path)))
    lines = [f"### {name}", ""]
    header = "| agents | " + " | ".join(planners) + " |"
    lines += [
        "succ = success rate; exp = avg CT expansions; t = avg planning",
        "time (s); adh = avg data adherence (success-conditioned).", "",
        header,
        "|" + "---|" * (len(planners) + 1),
    ]
    for n, per in sorted(analyzed.items()):
        cells = []
        for p in planners:
            d = per[p]
            if not d["num_trials"]:
                cells.append("—")
                continue
            cells.append(
                f"succ {d['success_rate']:.2f}, exp {d['avg_ct_expansions']:.1f}, "
                f"t {d['avg_planning_time']:.1f}s, adh {d['avg_data_adherence']:.2f}")
        lines.append(f"| {n} | " + " | ".join(cells) + " |")
    lines.append("")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dirs", nargs="+",
                    help="results/<time_str> dirs holding analyzed_results.pkl")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    text = "\n".join(render_dir(d) for d in args.results_dirs)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
