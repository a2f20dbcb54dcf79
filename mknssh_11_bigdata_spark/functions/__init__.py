"""Column-level function library (text, vectors). All JVM-side built-ins."""

from . import text, vectors  # noqa: F401
