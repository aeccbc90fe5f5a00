"""Tutorial notebooks run top-to-bottom (CI-style smoke).

Each notebook is a fully-offline walkthrough against the synthetic
dataset (built by scripts/build_notebooks.py); this test executes every
code cell in order in one namespace per notebook — the cheap equivalent
of `nbclient` execution, so broken API references in the tutorials fail
the suite. Plots are suppressed (Agg backend, plt.show patched out).
"""

import json
import os

import pytest

NB_DIR = os.path.join(os.path.dirname(__file__), "..", "notebooks")
NOTEBOOKS = [
    "inference_tutorial.ipynb",
    "finetuning_tutorial.ipynb",
    "evaluation_tutorial.ipynb",
    "segmentation_tutorial.ipynb",
    "scaling_tutorial.ipynb",
]


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_runs(name, monkeypatch, tmp_path):
    pytest.importorskip("matplotlib")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    monkeypatch.setattr(plt, "show", lambda *a, **k: None)
    # Notebooks assume cwd=notebooks/ with the repo root at ".."
    monkeypatch.chdir(NB_DIR)

    path = os.path.join(NB_DIR, name)
    nb = json.load(open(path))
    ns: dict = {}
    for idx, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        try:
            exec(compile(src, f"{name}[cell {idx}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"{name} cell {idx} raised {type(e).__name__}: {e}\n{src[:400]}")
    plt.close("all")
