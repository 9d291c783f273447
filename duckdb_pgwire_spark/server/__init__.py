"""PostgreSQL wire-protocol front-end (the reference's core novelty,
re-expressed over a SparkSession). See app.py for the architecture map.
"""

from .app import PgWireServer

__all__ = ["PgWireServer"]
