"""docs/REPRODUCE.md — the runbook must stay executable (VERDICT r3 item 6).

Extracts every ``# runbook:`` bash block from docs/REPRODUCE.md and executes
it against synthetic fixture corpora with shrink overrides (EPOCHS=1,
ACTIONS=walking, TRIALS=1, ...). A renamed flag, moved checkpoint path, or
changed module entry point fails here instead of rotting silently until
someone mounts real data.
"""

import os
import re
import shutil
import stat
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MD = os.path.join(REPO, "docs", "REPRODUCE.md")


def _console_scripts():
    """name -> (module, attr) from pyproject's [project.scripts]."""
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        try:
            import tomllib

            scripts = tomllib.load(f)["project"]["scripts"]
        except ModuleNotFoundError:  # py<3.11
            text = f.read().decode()
            m = re.search(r"\[project\.scripts\]\n(.*?)\n\[", text, re.S)
            scripts = dict(re.findall(r'([\w-]+) = "([^"]+)"', m.group(1)))
    return {name: tuple(target.split(":")) for name, target in scripts.items()}


@pytest.fixture(scope="session")
def script_bin(tmp_path_factory):
    """Directory holding the mmc-* console scripts for _run_block's PATH.

    The runbook blocks invoke the installed entry points by name. On a
    checkout that has NOT been `pip install -e .`ed (CI boxes, fresh
    clones) those are absent — so generate equivalent shims from
    pyproject's [project.scripts] mapping and run the runbook text
    verbatim against them.
    """
    if shutil.which("mmc-train-h36m"):
        return None  # real installed scripts win
    bindir = tmp_path_factory.mktemp("mmc_bin")
    for name, (module, attr) in _console_scripts().items():
        path = bindir / name
        path.write_text(
            f"#!{sys.executable}\n"
            "import sys\n"
            f"sys.path.insert(0, {str(REPO)!r})\n"
            f"from {module} import {attr}\n"
            f"sys.exit({attr}())\n"
        )
        path.chmod(path.stat().st_mode | stat.S_IXUSR)
    return str(bindir)


def _blocks():
    with open(MD) as f:
        text = f.read()
    return {m.group(1): m.group(2) for m in
            re.finditer(r"```bash\n# runbook: ([\w-]+)\n(.*?)```", text, re.S)}


@pytest.fixture(scope="session")
def corpora(tmp_path_factory):
    from motionmixerconv_tpu.data import fixtures
    from motionmixerconv_tpu.data.constants import AIS_ALL_ACTIONS

    base = tmp_path_factory.mktemp("reproduce_data")
    h36m = str(base / "h36m")
    ais = str(base / "ais")
    amass = str(base / "amass")
    fixtures.make_h36m_corpus(h36m, n_frames=400, seed=1)
    fixtures.make_ais_corpus(ais, actions=AIS_ALL_ACTIONS, n_frames=300,
                             seed=2)
    fixtures.make_amass_corpus(amass, n_frames=300, seed=4)
    return {"H36M_DATA": h36m, "AIS_DATA": ais, "AMASS_DATA": amass}


def _run_block(name, corpora, runs_dir, extra=None, timeout=2400,
               bindir=None):
    script = _blocks()[name]
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # disable the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    if bindir:
        env["PATH"] = bindir + os.pathsep + env.get("PATH", "")
    env.update(corpora)
    env["RUNS"] = str(runs_dir)
    # shrink overrides; the blocks default to the real reproduction values
    env.update({"EPOCHS": "1", "TRIALS": "1", "TF_EPOCHS": "1",
                "ACTIONS": "walking", "OUTPUT_N": "10", "BATCH": "50"})
    env.update(extra or {})
    os.makedirs(runs_dir, exist_ok=True)
    r = subprocess.run(["bash", "-e", "-c", script], env=env, cwd=REPO,
                       capture_output=True, timeout=timeout)
    assert r.returncode == 0, (
        f"runbook block {name!r} failed:\n--- stdout:\n"
        f"{r.stdout.decode()[-1500:]}\n--- stderr:\n{r.stderr.decode()[-1500:]}")
    return r.stdout.decode()


def test_all_blocks_are_named_and_unique():
    b = _blocks()
    assert set(b) == {
        "h36m-study", "h36m-study-tables", "h36m-best-config", "h36m-direct",
        "h36m-eval", "h36m-autoreg", "h36m-autoreg-study", "ais-local",
        "ais-global", "ais-autoreg", "amass",
    }
    for name, script in b.items():
        # every block is parameterized by the data/output env vars
        # (bash `$VAR` or python `os.environ[...]`)
        assert re.search(r"RUNS|H36M_DATA|AIS_DATA|AMASS_DATA", script), name


def test_h36m_direct_block(corpora, tmp_path, script_bin):
    out = _run_block("h36m-direct", corpora, tmp_path / "runs", bindir=script_bin)
    assert "Training finished" in out
    assert "tables.md" in out  # gallery tables built from the checkpoint
    assert os.path.exists(tmp_path / "runs" / "h36m_report" / "tables.md")


@pytest.mark.slow
def test_h36m_eval_block(corpora, tmp_path, script_bin):
    out = _run_block("h36m-eval", corpora, tmp_path / "runs", bindir=script_bin)
    assert "Training finished" in out


@pytest.mark.slow
def test_h36m_study_blocks(corpora, tmp_path, script_bin):
    _run_block("h36m-study", corpora, tmp_path / "runs", bindir=script_bin)
    out = _run_block("h36m-study-tables", corpora, tmp_path / "runs", bindir=script_bin)
    assert "trial" in out.lower() or "kernel" in out.lower()


@pytest.mark.slow
def test_h36m_autoreg_block(corpora, tmp_path, script_bin):
    # the reference AR defaults (hidden 192, 8 channels, BN) exceed the
    # CPU-smoke budget; the shrink vars default to the real values
    _run_block("h36m-autoreg", corpora, tmp_path / "runs", bindir=script_bin,
               extra={"AR_HIDDEN": "32", "AR_BLOCKS": "1", "AR_NCHAN": "1"})


@pytest.mark.slow
def test_ais_blocks(corpora, tmp_path, script_bin):
    _run_block("ais-local", corpora, tmp_path / "runs", bindir=script_bin)
    _run_block("ais-global", corpora, tmp_path / "runs", bindir=script_bin)


@pytest.mark.slow
def test_ais_autoreg_block(corpora, tmp_path, script_bin):
    _run_block("ais-autoreg", corpora, tmp_path / "runs", bindir=script_bin)


@pytest.mark.slow
def test_amass_block(corpora, tmp_path, script_bin):
    _run_block("amass", corpora, tmp_path / "runs", bindir=script_bin)


@pytest.mark.slow
def test_h36m_best_config_block(corpora, tmp_path, script_bin):
    out = _run_block("h36m-best-config", corpora, tmp_path / "runs", bindir=script_bin)
    assert "[" in out  # printed trial values
