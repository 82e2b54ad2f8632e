"""Round-7 ADVICE: SPARK_GRAFT_MM_PAYLOAD_REPEAT must not desync the
mm_* oracles from the Spark plan. The knob is now read once at import
(MM_PAYLOAD_REPEAT) and every knob-dependent oracle SQL string is
GENERATED from it, so plan and oracle move in lockstep at any repeat
factor instead of failing as an unexplained hash mismatch.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHECK = r"""
import blog_snapshotbackup_azuredatalake_spark.operators.multimodal as mm
rep = mm.MM_PAYLOAD_REPEAT
body = 64 * rep
assert mm._PAYLOAD_BYTES == 12 + body
for sql in (mm._MM_DECODE_SQL, mm._MM_META_AUDIT_SQL):
    assert f"repeat(md5(text), {2 * rep})" in sql, (rep, sql[:200])
    assert str(body) in sql
assert f"{12 + body} + octet_length" in mm._MM_SHARD_PACK_SQL
assert f"CAST({12 + body} AS BIGINT) AS n_bytes" in mm._MM_DECODE_SQL
assert f"range(1, {body + 1})" in mm._MM_DECODE_SQL
assert f"/ {body}.0 AS mean_byte" in mm._MM_DECODE_SQL
print("OK", rep)
"""


def _run(rep: str | None) -> str:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MM_PAYLOAD_REPEAT", None)
    if rep is not None:
        env["SPARK_GRAFT_MM_PAYLOAD_REPEAT"] = rep
    out = subprocess.run(
        [sys.executable, "-c", _CHECK],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout.strip()


def test_default_rep_is_one():
    assert _run(None) == "OK 1"


def test_oracles_follow_the_knob():
    assert _run("4") == "OK 4"


def test_knob_floor_is_one():
    assert _run("0") == "OK 1"
