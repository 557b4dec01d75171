"""Result aggregation helpers (analogue of reference eval/collect_mmlu_result.py:
mean accuracy over hendrycksTest-* subtasks, plus generic harness-results table
formatting mirroring eval/README.md)."""

from __future__ import annotations

from typing import Mapping

import numpy as np


def collect_mmlu(results: Mapping[str, Mapping[str, float]],
                 prefix: str = "mmlu", metric: str = "acc,none") -> float:
    """Mean accuracy over MMLU subtasks in a harness results dict
    (`results["results"]` style mapping task -> metrics)."""
    accs = []
    for task, metrics in results.items():
        if task.startswith(prefix) or task.startswith("hendrycksTest"):
            for key in (metric, "acc", "acc_norm,none", "acc_norm"):
                if key in metrics:
                    accs.append(float(metrics[key]))
                    break
    if not accs:
        raise ValueError(f"no tasks with prefix {prefix!r} in results")
    return float(np.mean(accs))


def results_table(rows: Mapping[str, Mapping[str, float]]) -> str:
    """Markdown regression table in the reference eval/README.md layout:
    rows = {config_name: {"wikitext_ppl":…, "arc_c":…, "hellaswag":…, "mmlu":…}}."""
    cols = ["wikitext_ppl", "arc_c", "hellaswag", "mmlu"]
    out = ["| config | " + " | ".join(cols) + " |",
           "|---" * (len(cols) + 1) + "|"]
    for name, metrics in rows.items():
        cells = [f"{metrics.get(c, float('nan')):.2f}" for c in cols]
        out.append(f"| {name} | " + " | ".join(cells) + " |")
    return "\n".join(out)
