"""Permanent gate for the round-5 HOF-lambda re-evaluation pathology
(SCALE.md): no HOF lambda in the package may reference an
expression-valued outer variable — Spark re-evaluates it per element,
turning linear passes quadratic (measured 15-24× on the bigram/chunk
keys before the fix). The scanner must also still CATCH the original
defect, so the gate can't rot into a tautology."""

import os
import subprocess
import sys
import textwrap

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
)
from hof_lambda_scan import scan_file  # noqa: E402


def test_package_has_no_hof_lambda_hazards():
    proc = subprocess.run(
        [sys.executable, os.path.join("scripts", "hof_lambda_scan.py")],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_scanner_catches_the_original_defect(tmp_path):
    bad = textwrap.dedent(
        """
        def text_repetition(spark, sf_dir):
            words = F.filter(F.split("text", r"\\s+"), lambda w: w != "")
            bigrams = F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.element_at(words, i),
            )
            return bigrams
        """
    )
    p = tmp_path / "bad.py"
    p.write_text(bad)
    findings = scan_file(str(p))
    assert len(findings) == 1 and "words" in findings[0]


def test_unrelated_lambda_param_does_not_excuse_the_name(tmp_path):
    # an unrelated lambda elsewhere in the function using 'w' as its param
    # must not excuse a HOF lambda's reference to the expression-valued 'w'
    bad = textwrap.dedent(
        """
        def dedup_passage_chunks(spark, sf_dir):
            w = F.filter(F.split("text", r"\\s+"), lambda w: w != "")
            chunks = F.transform(
                F.sequence(F.lit(0), F.size(w) - 1),
                lambda i: F.slice(w, i + 1, 10),
            )
            return chunks
        """
    )
    p = tmp_path / "bad2.py"
    p.write_text(bad)
    findings = scan_file(str(p))
    assert len(findings) == 1 and "'w'" in findings[0]


def test_keyword_arg_lambda_is_scanned(tmp_path):
    bad = textwrap.dedent(
        """
        def fn(spark, sf_dir):
            arr = F.split("text", r"\\s+")
            out = F.aggregate(
                F.col("xs"),
                F.lit(0),
                merge=lambda acc, x: acc + F.size(arr),
            )
            return out
        """
    )
    p = tmp_path / "bad3.py"
    p.write_text(bad)
    findings = scan_file(str(p))
    assert len(findings) == 1 and "'arr'" in findings[0]


def test_enclosing_lambda_param_is_excused(tmp_path):
    # nested-lambda pattern (pair_expr in the LSH keys): inner lambda refs
    # the OUTER lambda's param — legitimate, must not be flagged
    good = textwrap.dedent(
        """
        def pairs(spark, sf_dir):
            ids = F.col("ids")
            pair_expr = F.flatten(
                F.transform(
                    ids,
                    lambda a: F.transform(
                        F.filter(ids, lambda b: b > a),
                        lambda b: F.struct(a, b),
                    ),
                )
            )
            return pair_expr
        """
    )
    p = tmp_path / "good2.py"
    p.write_text(good)
    assert scan_file(str(p)) == []


def test_scanner_accepts_the_fixed_form(tmp_path):
    good = textwrap.dedent(
        """
        def text_repetition(spark, sf_dir):
            words = F.col("words")
            bigrams = F.transform(
                F.sequence(F.lit(1), F.size(words) - 1),
                lambda i: F.element_at(words, i),
            )
            return bigrams
        """
    )
    p = tmp_path / "good.py"
    p.write_text(good)
    assert scan_file(str(p)) == []
