"""Shared validation for the multi-task factories (reference
deepctr/models/multitask/*.py argument checks)."""
from __future__ import annotations


def validate_tasks(task_types, task_names, min_tasks=2):
    num_tasks = len(task_names)
    if num_tasks < min_tasks:
        raise ValueError("num_tasks must be greater than 1")
    if len(task_types) != num_tasks:
        raise ValueError("num_tasks must be equal to the length of task_types")
    for task_type in task_types:
        if task_type not in ("binary", "regression"):
            raise ValueError(
                "task must be binary or regression, {} is illegal".format(task_type)
            )
    return num_tasks
