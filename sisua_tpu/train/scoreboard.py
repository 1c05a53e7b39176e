"""ScoreBoard — sqlite-backed experiment score tables.

Re-provides the `[odin] ScoreBoard` capability the reference's experimenter
writes into (``/root/reference/sisua/train.py:153-190``:
``SE.write_scores(table=..., unique=..., replace=...)``,
``evaluate.py:32-48``: ``SE.write_error``). One sqlite file per experiment
root; tables are (unique-key, metric, value) triples plus an error log.
"""

from __future__ import annotations

import json
import os
import sqlite3
import time
from typing import Dict, List, Optional

import pandas as pd

__all__ = ["ScoreBoard"]


class ScoreBoard:

  def __init__(self, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    self.path = path
    self._conn = sqlite3.connect(path)
    self._conn.execute(
        "CREATE TABLE IF NOT EXISTS scores ("
        "  tab TEXT, uid TEXT, metric TEXT, value REAL, ts REAL,"
        "  PRIMARY KEY (tab, uid, metric))")
    self._conn.execute(
        "CREATE TABLE IF NOT EXISTS errors ("
        "  uid TEXT, message TEXT, ts REAL)")
    self._conn.commit()

  def write_scores(self, table: str, unique: str,
                   scores: Dict[str, float], replace: bool = True) -> None:
    now = time.time()
    op = "INSERT OR REPLACE" if replace else "INSERT OR IGNORE"
    rows = []
    for k, v in scores.items():
      try:
        rows.append((table, unique, str(k), float(v), now))
      except (TypeError, ValueError):
        rows.append((table, unique, str(k), float("nan"), now))
    self._conn.executemany(
        f"{op} INTO scores (tab, uid, metric, value, ts) "
        "VALUES (?, ?, ?, ?, ?)", rows)
    self._conn.commit()

  def write_error(self, unique: str, message: str) -> None:
    self._conn.execute("INSERT INTO errors (uid, message, ts) VALUES (?,?,?)",
                       (unique, message, time.time()))
    self._conn.commit()

  def read_scores(self, table: Optional[str] = None) -> pd.DataFrame:
    """Wide (uid × metric) DataFrame of one table; with ``table=None`` the
    index is (tab, uid) so same-named metrics from different dataset tables
    stay separate rows instead of being silently mean-aggregated."""
    q = "SELECT tab, uid, metric, value FROM scores"
    params: tuple = ()
    if table is not None:
      q += " WHERE tab = ?"
      params = (table,)
    df = pd.read_sql_query(q, self._conn, params=params)
    if df.empty:
      return df
    index = "uid" if table is not None else ["tab", "uid"]
    return df.pivot_table(index=index, columns="metric", values="value")

  def read_errors(self) -> pd.DataFrame:
    return pd.read_sql_query("SELECT * FROM errors", self._conn)

  @property
  def tables(self) -> List[str]:
    cur = self._conn.execute("SELECT DISTINCT tab FROM scores")
    return [r[0] for r in cur.fetchall()]

  def close(self):
    self._conn.close()
