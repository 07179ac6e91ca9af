"""Experiment fan-out: local parallel workers or SLURM batch scripts.

Mirrors deps/experiment_launcher/experiment_launcher/launcher.py:16-296:
accumulate experiment parameter dicts, then run locally (process pool or
sequential, the reference uses joblib) or emit+submit SLURM array scripts.
Each run gets its own results directory with the resolved args saved as
args.yaml (the decorator behavior, decorators.py:8-49).
"""
from __future__ import annotations

import itertools
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path
from typing import Callable, Dict, List, Optional

import yaml


def _run_one(payload):
    fn, params, results_dir, seed = payload
    run_dir = os.path.join(results_dir, str(seed))
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    with open(os.path.join(run_dir, "args.yaml"), "w") as f:
        yaml.safe_dump({**{k: v for k, v in params.items()
                           if isinstance(v, (int, float, str, bool, list))},
                        "seed": seed, "results_dir": run_dir}, f)
    try:
        return fn(seed=seed, results_dir=run_dir, **params)
    except Exception as e:  # noqa: BLE001 — sweeps continue past failures
        with open(os.path.join(run_dir, "error.txt"), "w") as f:
            f.write(repr(e))
        return e


class Launcher:
    """reference: launcher.py:16-296."""

    def __init__(self, exp_name: str, exp_fn: Optional[Callable] = None,
                 exp_file: Optional[str] = None, n_seeds: int = 1,
                 n_exps_in_parallel: int = 1,
                 base_dir: str = "./logs",
                 partition: Optional[str] = None, gres: Optional[str] = None,
                 memory_per_core: int = 2000, hours: int = 24):
        self.exp_name = exp_name
        self.exp_fn = exp_fn
        self.exp_file = exp_file
        self.n_seeds = n_seeds
        self.n_exps_in_parallel = n_exps_in_parallel
        self.base_dir = base_dir
        self.partition = partition
        self.gres = gres
        self.memory_per_core = memory_per_core
        self.hours = hours
        self._experiments: List[Dict] = []

    def add_experiment(self, **params):
        """reference: launcher.py:96-98."""
        self._experiments.append(params)

    # -------------------------------------------------------------- local
    def run(self, local: bool = True, test: bool = False):
        """reference: launcher.py:99-109. test=True dry-runs (prints only)."""
        if test:
            for params in self._experiments:
                for seed in range(self.n_seeds):
                    print(f"[dry-run] {self.exp_name} seed={seed} params={params}")
            return []
        if local:
            return self._run_local()
        return self._run_slurm()

    def _results_dir(self, params: Dict) -> str:
        tag = "_".join(f"{k}_{v}" for k, v in params.items()
                       if isinstance(v, (int, float, str, bool)))[:128]
        d = os.path.join(self.base_dir, self.exp_name, tag or "default")
        return d

    def _run_local(self):
        """joblib-Parallel equivalent (reference: launcher.py:242-265)."""
        payloads = [(self.exp_fn, params, self._results_dir(params), seed)
                    for params in self._experiments
                    for seed in range(self.n_seeds)]
        if self.n_exps_in_parallel <= 1:
            return [_run_one(p) for p in payloads]
        with ProcessPoolExecutor(max_workers=self.n_exps_in_parallel) as ex:
            return list(ex.map(_run_one, payloads))

    # -------------------------------------------------------------- slurm
    def generate_slurm(self, params: Dict) -> str:
        """reference: launcher.py:111-211."""
        results_dir = self._results_dir(params)
        Path(results_dir).mkdir(parents=True, exist_ok=True)
        lines = [
            "#!/bin/bash",
            f"#SBATCH --job-name={self.exp_name}",
            f"#SBATCH --array=0-{self.n_seeds - 1}",
            f"#SBATCH --time={self.hours}:00:00",
            f"#SBATCH --mem-per-cpu={self.memory_per_core}",
            f"#SBATCH --output={results_dir}/%a/slurm.out",
        ]
        if self.partition:
            lines.append(f"#SBATCH --partition={self.partition}")
        if self.gres:
            lines.append(f"#SBATCH --gres={self.gres}")
        arg_str = " ".join(f"--{k} {v}" for k, v in params.items())
        lines.append(f"{sys.executable} {self.exp_file} {arg_str} "
                     f"--seed $SLURM_ARRAY_TASK_ID --results_dir {results_dir}/$SLURM_ARRAY_TASK_ID")
        script = "\n".join(lines) + "\n"
        script_path = os.path.join(results_dir, "slurm.sh")
        with open(script_path, "w") as f:
            f.write(script)
        return script_path

    def _run_slurm(self):
        paths = [self.generate_slurm(params) for params in self._experiments]
        for p in paths:
            subprocess.run(["sbatch", p], check=False)
        return paths
