"""The evaluation notebooks are valid AND their code cells execute end
to end on the synthetic backend (no jupyter runtime needed — cells run
in one namespace per notebook, like Run-All)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NB_DIR = os.path.join(REPO, "notebooks")
NOTEBOOKS = ("evaluate_MNIST.ipynb", "evaluate_brain.ipynb",
             "evaluate_cardiac.ipynb")


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_valid(name):
    nbformat = pytest.importorskip("nbformat")
    with open(os.path.join(NB_DIR, name)) as f:
        nb = nbformat.read(f, as_version=4)
    nbformat.validate(nb)
    kinds = [c.cell_type for c in nb.cells]
    assert "markdown" in kinds and "code" in kinds


def test_notebooks_regenerate_cleanly(tmp_path):
    """tools/make_notebooks.py reproduces the committed artifacts'
    cell contents (generated into a scratch dir — cell ids are random
    per nbformat, so compare sources; the repo copies stay untouched)."""
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run([sys.executable, "tools/make_notebooks.py",
                        "--out", str(tmp_path)],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]

    def cells(path):
        with open(path) as f:
            nb = json.load(f)
        return [(c["cell_type"], "".join(c["source"]))
                for c in nb["cells"]]

    for name in NOTEBOOKS:
        assert cells(os.path.join(NB_DIR, name)) == \
            cells(str(tmp_path / name)), \
            f"{name}: committed notebook drifted from the generator — " \
            f"rerun tools/make_notebooks.py and commit"


@pytest.mark.slow
@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_cells_execute(name, tmp_path):
    """Run-All semantics: every code cell executes in order in a fresh
    subprocess (cwd = a scratch dir standing in for notebooks/)."""
    with open(os.path.join(NB_DIR, name)) as f:
        nb = json.load(f)
    sources = ["import sys; sys.path.insert(0, %r)" % REPO]
    for cell in nb["cells"]:
        if cell["cell_type"] == "code":
            sources.append("".join(cell["source"]))
    script = tmp_path / "nb_run.py"
    script.write_text("\n\n".join(sources))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=REPO, NB_EPOCHS="2", MPLBACKEND="Agg")
    r = subprocess.run([sys.executable, str(script)], cwd=str(tmp_path),
                       env=env, capture_output=True, text=True,
                       timeout=1200)
    assert r.returncode == 0, (r.stdout[-1500:] + "\n" + r.stderr[-3000:])
    assert "epoch" in r.stdout  # the training cells actually ran
