#!/usr/bin/env bash
# Execute the documented Postgres-vs-Derby JDBC dialect surface
# (JdbcSource.scala scaladoc, commit 01ed2ef) against a REAL Postgres.
#
# The sandbox has Postgres 15 server binaries + psql but no JDBC driver
# jar (zero egress), so the in-JVM JdbcSourceSpec still runs against
# Derby; this script proves the four dialect-sensitive facts that spec
# relies on, plus the reference probe-query shapes, on the real engine:
#   1. numeric(20,0) round-trips all 20 digits exactly
#   2. unquoted identifiers fold to LOWERCASE (Derby folds UP; our
#      all-lowercase names are the no-op case for both)
#   3. bytea round-trips (hex in = hex out)
#   4. timestamp WITHOUT time zone is wall-clock — client TZ changes
#      do not shift stored values
#   5. the tip-probe SQL shapes (ORDER BY ... DESC LIMIT 1 OFFSET 3;
#      two-CTE UNION ALL max; Spark-style quoted pushdown WHERE) parse
#      and return the expected rows on Postgres 15
#
# The server refuses to run as root, so all server-side commands run as
# the unprivileged `postgres` user via su.
#
# Usage: bash tools/check_pg_dialect.sh   (exit 0 = all pass)
set -u
PGDATA=/tmp/pg_graft_data
SOCK=/tmp/pg_graft_sock
PORT=5498

aspg() { su postgres -s /bin/bash -c "$1"; }
cleanup() { aspg "pg_ctl -D $PGDATA stop -m immediate" >/dev/null 2>&1; rm -rf "$PGDATA" "$SOCK"; }
trap cleanup EXIT
rm -rf "$PGDATA" "$SOCK"; mkdir -p "$PGDATA" "$SOCK"
chown postgres "$PGDATA" "$SOCK"

aspg "initdb -D $PGDATA -U postgres --no-sync" >/dev/null 2>&1 || { echo "FAIL initdb"; exit 1; }
aspg "pg_ctl -D $PGDATA -o '-p $PORT -k $SOCK -c listen_addresses=\"\"' -w -l $PGDATA/log start" >/dev/null 2>&1 \
  || { echo "FAIL pg start"; aspg "cat $PGDATA/log"; exit 1; }
PSQL="psql -h $SOCK -p $PORT -U postgres -d postgres -qtAX"

fails=0
check() { # name expected actual
  if [ "$2" == "$3" ]; then echo "PASS  $1"; else echo "FAIL  $1: want [$2] got [$3]"; fails=$((fails+1)); fi
}

$PSQL >/dev/null <<'SQL'
CREATE TABLE block (id bigint NOT NULL, time timestamp NOT NULL);
CREATE TABLE tx (id bigint NOT NULL, hash bytea NOT NULL, block_id bigint NOT NULL);
CREATE TABLE ma_tx_out (ident bigint NOT NULL, quantity numeric(20,0) NOT NULL, tx_out_id bigint NOT NULL);
CREATE TABLE asset_tx (id bigint, tx_time timestamp);
CREATE TABLE asset_mint_tx (id bigint, tx_time timestamp);
INSERT INTO block VALUES
 (1,'2021-03-01 21:47:00'),(2,'2021-03-01 21:48:00'),(3,'2021-03-01 21:49:00'),
 (4,'2021-03-01 21:50:00'),(5,'2021-03-01 21:51:00'),(6,'2021-03-01 21:52:00');
INSERT INTO tx VALUES (1,'\xdeadbeef',1);
INSERT INTO ma_tx_out VALUES (1,99999999999999999999,1);
INSERT INTO asset_tx VALUES (1,'2021-03-02 00:00:00'),(2,'2021-03-03 00:00:00');
INSERT INTO asset_mint_tx VALUES (1,'2021-03-04 00:00:00');
SQL

# 1. numeric(20,0): full 20 digits, exact
check "numeric(20,0) 20-digit round-trip" "99999999999999999999" \
  "$($PSQL -c "SELECT quantity FROM ma_tx_out WHERE ident = 1")"

# 2. unquoted identifier folding: Postgres folds DOWN (Derby folds UP)
$PSQL -c "CREATE TABLE CaseProbe (MixedCol int)" >/dev/null
check "unquoted identifiers fold to lowercase" "caseprobe|mixedcol" \
  "$($PSQL -c "SELECT table_name || '|' || column_name FROM information_schema.columns WHERE table_name = 'caseprobe'")"

# 3. bytea round-trip
check "bytea hex round-trip" "deadbeef" \
  "$($PSQL -c "SELECT encode(hash, 'hex') FROM tx WHERE id = 1")"

# 4. timestamp (no tz) is wall-clock under any client TZ
check "timestamp w/o tz ignores client TZ" "2021-03-01 21:47:00" \
  "$($PSQL -c "SET timezone = 'America/New_York'; SELECT time FROM block WHERE id = 1")"

# 5a. cardano tip probe shape (postgres.py:262-278): 4th-newest block
check "tip probe ORDER BY DESC LIMIT 1 OFFSET 3" "2021-03-01 21:49:00" \
  "$($PSQL -c "SELECT b.time FROM block b ORDER BY b.time DESC LIMIT 1 OFFSET 3")"

# 5b. sink tip UNION ALL probe shape (postgres.py:280-312)
check "sink tip two-CTE UNION ALL max" "2021-03-04 00:00:00" \
  "$($PSQL -c "WITH a AS (SELECT max(tx_time) t FROM asset_tx), b AS (SELECT max(tx_time) t FROM asset_mint_tx) SELECT max(t) FROM (SELECT t FROM a UNION ALL SELECT t FROM b) u")"

# 5c. Spark PostgresDialect pushdown shape: quoted identifiers + pushed
#     half-open time-range WHERE (what spark.read.jdbc emits for P4)
check "Spark-style quoted pushdown WHERE" "3" \
  "$($PSQL -c "SELECT count(*) FROM (SELECT \"id\",\"time\" FROM block WHERE (\"time\" >= TIMESTAMP '2021-03-01 21:48:00') AND (\"time\" < TIMESTAMP '2021-03-01 21:51:00')) q")"

echo
if [ $fails -eq 0 ]; then echo "ALL PASS (Postgres $($PSQL -c 'SHOW server_version'))"; else echo "$fails FAILED"; exit 1; fi
