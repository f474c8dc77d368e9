"""The examples/ demos must run (the analog of the reference's
``ezpz/examples/{basic,parser}.rs``, which CI compiles and runs)."""

import os
import runpy

HERE = os.path.dirname(os.path.abspath(__file__))
EXAMPLES = os.path.join(os.path.dirname(HERE), "examples")


def test_basic_example(capsys):
    runpy.run_path(os.path.join(EXAMPLES, "basic.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "|PQ| = 4.000000000" in out


def test_parser_example(capsys):
    runpy.run_path(os.path.join(EXAMPLES, "parser.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "p = (0.000000, 0.000000)" in out


def test_scale_example(capsys):
    runpy.run_path(os.path.join(EXAMPLES, "scale.py"), run_name="__main__")
    out = capsys.readouterr().out
    assert "fleet: 4096 sketches, all converged = True" in out
    assert "converged = True, all line lengths = 4.000000" in out
