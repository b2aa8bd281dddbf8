"""JVM-side UDFs shipped as compilable source (no binary artifacts in
the repo): build with the local JDK, attach to a RUNNING session via
``ADD JAR`` + ``registerJavaFunction`` — no cluster restart, no
spark.jars config.  Currently one UDF: Unicode NFC normalization
(``ArchitxtNfcNormalize.java``), the zero-copy alternative to the Arrow
``pandas_udf`` fallback in :func:`architxt_spark.functions.text.
nfc_normalize` (which auto-detects the registered name).

Reference analogue: the reference normalizes text driver-side with
unidecode (``architxt/nlp/utils.py:29``); here normalization is a
distributed column op and this module keeps it JVM-side at scale.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import zipfile

#: session function name functions/text.py probes for (keep in sync with
#: text.JVM_NFC_FUNC — tested by test_jvm_nfc.py)
JVM_NFC_FUNC = "architxt_nfc"
JVM_NFC_CLASS = "ArchitxtNfcNormalize"

_SOURCE = os.path.join(os.path.dirname(__file__), f"{JVM_NFC_CLASS}.java")


def _spark_udf_classpath() -> str:
    """The jar that declares ``org.apache.spark.sql.api.java.UDF1`` from
    the installed pyspark distribution."""
    import glob

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = sorted(glob.glob(os.path.join(jars, "spark-sql-api_*.jar")))
    # older layouts bundle the API classes in spark-sql / spark-catalyst
    hits = hits or sorted(glob.glob(os.path.join(jars, "spark-sql_*.jar")))
    if not hits:
        raise RuntimeError(f"no spark-sql jar under {jars!r} to compile against")
    return hits[-1]


def build_nfc_jar(out_dir: str | None = None) -> str:
    """Compile ``ArchitxtNfcNormalize.java`` with the local JDK and zip
    the class into a jar; returns the jar path.  Raises RuntimeError
    with a clear remedy when no ``javac`` is on PATH (the caller then
    stays on the pandas_udf fallback)."""
    javac = shutil.which("javac")
    if javac is None:
        raise RuntimeError(
            "javac not found: install a JDK (or pre-build the jar "
            "elsewhere) to enable the JVM NFC path; nfc_normalize falls "
            "back to the Arrow pandas_udf without it"
        )
    out_dir = out_dir or tempfile.mkdtemp(prefix="architxt_jvm_")
    subprocess.run(
        [javac, "-cp", _spark_udf_classpath(), "-d", out_dir, _SOURCE],
        check=True,
        capture_output=True,
    )
    jar_path = os.path.join(out_dir, "architxt-nfc.jar")
    with zipfile.ZipFile(jar_path, "w") as z:
        z.write(
            os.path.join(out_dir, f"{JVM_NFC_CLASS}.class"),
            f"{JVM_NFC_CLASS}.class",
        )
    return jar_path


def register_jvm_nfc(spark, jar_path: str | None = None) -> str:
    """Attach the JVM NFC UDF to a running session: build the jar when
    none is given, ``ADD JAR`` it, and register it under
    :data:`JVM_NFC_FUNC`.  From this point every
    :func:`~architxt_spark.functions.text.nfc_normalize` /
    ``clean_unicode`` call on this session runs JVM-side.  Returns the
    jar path (reusable across sessions on the same host)."""
    from pyspark.sql.types import StringType

    if jar_path is None:
        jar_path = build_nfc_jar()
    spark.sql(f"ADD JAR {jar_path}")
    spark.udf.registerJavaFunction(JVM_NFC_FUNC, JVM_NFC_CLASS, StringType())
    return jar_path
