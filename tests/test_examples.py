"""The example scripts must run (the reference's test_example.py runs its
example scripts, SURVEY §4).  Executed in-process on the suite's CPU
backend — the scripts pick up the already-configured platform."""

import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("script", [
    pytest.param("quickstart.py", marks=pytest.mark.smoke),
    "streaming_inference.py", "long_context.py", "deployment.py",
])
def test_example_runs(script, capsys):
    import runpy

    runpy.run_path(os.path.join(EXAMPLES, script), run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{script} printed nothing"
