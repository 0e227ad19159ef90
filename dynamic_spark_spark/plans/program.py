"""Whole-program job type (A3/A4) and dependency injection (A9).

The reference runs arbitrary user Spark applications, resolving the entry
point in priority order ``JavaSparkMain.run`` → ``SparkMain.run`` →
``static main(args)`` (``ScalaSparkProgram.java:108-141``), and ships extra
user libraries to the workers (``PySparkProgram.java:59-70,83-89`` pyFiles;
``SparkCompilers.addDependencies`` jar URIs, ``SparkCompilers.java:157-203``).

Native analog:

- :func:`run_program` executes a user Python source string (or module) with
  the same priority chain: ``main(spark, args)`` → ``main(spark)`` →
  ``main()``; the namespace is pre-seeded like compute stages;
- :func:`add_py_files` registers ``.py``/``.zip``/``.egg`` files with the
  SparkContext so user closures can import them on executors — the pyFiles
  analog (wildcard directory expansion mirrors ``SparkCompilers.java:162-165``).
"""

from __future__ import annotations

import glob
import inspect
import os
from typing import Any

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamic_spark_spark.plans.usercode import UserCodeError


def add_py_files(spark: SparkSession, paths: list[str]) -> list[str]:
    """Ship python dependencies to executors (A9/A4 analog). ``*`` wildcards
    expand like the reference's dependency dirs (``SparkCompilers.java:162-165``).
    Returns the resolved file list."""
    resolved: list[str] = []
    for p in paths:
        matches = sorted(glob.glob(p)) if any(ch in p for ch in "*?[") else [p]
        for m in matches:
            if not os.path.exists(m):
                raise FileNotFoundError(f"pyFile not found: {m}")
            spark.sparkContext.addPyFile(m)
            resolved.append(m)
    return resolved


def run_program(
    spark: SparkSession,
    code: str,
    *,
    args: list[str] | None = None,
    py_files: list[str] | None = None,
    program_name: str = "program",
) -> Any:
    """Execute a whole user program (A3 analog).

    Entry-point resolution priority (mirroring ``ScalaSparkProgram.java:108-141``):
    ``main(spark, args)`` → ``main(spark)`` → ``main()``. Returns whatever
    the program returns (typically a DataFrame or None).
    """
    if py_files:
        add_py_files(spark, py_files)
    try:
        compiled = compile(code, f"<program:{program_name}>", "exec")
    except SyntaxError as e:
        raise UserCodeError(f"program '{program_name}' failed to compile: {e}") from e
    namespace: dict[str, Any] = {
        "spark": spark,
        "F": F,
        "Window": Window,
        "T": T,
    }
    exec(compiled, namespace)  # noqa: S102 — whole-program user code is the feature (A3)
    main = namespace.get("main")
    if not callable(main):
        raise UserCodeError(
            f"program '{program_name}' must define main(spark[, args]) / main()"
        )
    params = [
        p
        for p in inspect.signature(main).parameters.values()
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    ]
    if len(params) >= 2:
        return main(spark, list(args or []))
    if len(params) == 1:
        return main(spark)
    return main()
