#!/usr/bin/env python
"""Render the reference fixture corpus as ONE byte-realistic
``mysqldump`` artifact — the file a user would actually hand this tool.

The reference keeps its corpus as separate mysql-client scripts
(`/root/reference/scripts/mysql/{create_table,create_index,insert_data,
create_view,create_function}.sql`); a real offline migration starts from
`mysqldump --routines <db>` output instead. This renderer re-expresses
the same corpus in that dump dialect, faithful to mysqldump 8.0's
layout (verified against the format documented in MySQL's manual and
mysqldump.cc's emitted headers):

- the `/*!40101 SET @OLD_…*/` session-variable header/footer blocks;
- per table: the `-- Table structure` banner, `DROP TABLE IF EXISTS`,
  the `@saved_cs_client` wrap, and the CREATE TABLE block with the
  corpus' standalone `CREATE INDEX` statements folded back INLINE as
  `KEY`/`UNIQUE KEY` lines (mysqldump always inlines secondary
  indexes);
- per seeded table: `-- Dumping data` banner, `LOCK TABLES … WRITE;`
  `/*!40000 ALTER TABLE … DISABLE KEYS */;` then the INSERTs, then the
  re-enable + `UNLOCK TABLES;`;
- per view: the `/*!50001 CREATE TABLE … */` temporary stand-in in the
  table section, and the final view section's `/*!50001 DROP VIEW`
  plus `/*!50001 CREATE ALGORITHM=UNDEFINED */ /*!50013
  DEFINER=… SQL SECURITY DEFINER */ /*!50001 VIEW … AS … */`;
- `--routines`: the `-- Dumping routines` banner and each function as
  `DELIMITER ;;` + `/*!50003 CREATE*/ /*!50020 DEFINER=…*/ /*!50003
  FUNCTION … END */;;` with the `@saved_sql_mode` save/restore wrap;
- triggers: mysqldump includes them by DEFAULT, emitted right after
  the owning table's data section in the same `/*!50003*/` +
  DELIMITER-switched wrap. The built-in TRIGGERS corpus includes an
  audit-INSERT body — a bare `INSERT INTO …;` line inside a
  DELIMITER-switched region — the exact shape the section-aware
  `dump_schema_text` filter must NOT mistake for bulk data (ADVICE r8:
  the old line-prefix filter silently dropped it, mistranslating the
  trigger).

Usage: ``python tools/make_mysqldump.py [out.sql]`` (default
/tmp/corpus_dump.sql); the capstone test calls ``render_corpus_dump``
directly.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/scripts/mysql"

_IDX_RE = re.compile(
    r"(?is)^\s*CREATE\s+(UNIQUE\s+)?INDEX\s+`?(\w+)`?\s+"
    r"ON\s+`?(\w+)`?\s*\((.*?)\)\s*$"
)
_CT_RE = re.compile(r"(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?")
_VIEW_RE = re.compile(
    r"(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:ALGORITHM\s*=\s*\w+\s+)?"
    r"(?:DEFINER\s*=\s*\S+\s+)?(?:SQL\s+SECURITY\s+\w+\s+)?"
    r"VIEW\s+`?(\w+)`?\s+AS\s+(.*)$"
)
_INSERT_RE = re.compile(r"(?is)^\s*INSERT\s+INTO\s+`?(\w+)`?")
_FN_NAME_RE = re.compile(r"(?is)^\s*CREATE\s+FUNCTION\s+`?(\w+)`?")

#: Trigger corpus (the reference's scripts have none — mysqldump emits
#: triggers by default, so a byte-realistic dump must carry some). The
#: audit trigger's body deliberately contains a line-leading
#: ``INSERT INTO …;`` — the ADVICE-r8 repro for the data-drop filter.
TRIGGERS: dict[str, list[str]] = {
    "case_41_parent": [
        "CREATE TRIGGER `case_41_parent_audit` BEFORE UPDATE ON "
        "`case_41_parent` FOR EACH ROW\n"
        "BEGIN\n"
        "INSERT INTO case_41_foreign_key (id, parent_id, name) "
        "VALUES (NEW.id, NEW.id, NEW.name);\n"
        "SET NEW.name = UPPER(NEW.name);\n"
        "END",
    ],
}

#: Event corpus (round 9; widened rounds 12-13): `mysqldump --events`
#: sections ride real dumps. The cron-expressible subset translates to
#: pg_cron `SELECT cron.schedule(…)` DDL; one-shot AT and non-divisor
#: cadences emulate via guarded DO blocks; compound bodies ride a
#: synthesized procedure; DISABLE'd events schedule INACTIVE.
EVENTS: list[str] = [
    # translates: EVERY 1 DAY + literal STARTS → '0 0 * * *'
    "CREATE EVENT `purge_stale_sessions` ON SCHEDULE EVERY 1 DAY "
    "STARTS '2024-01-01 00:00:00' ON COMPLETION NOT PRESERVE ENABLE "
    "DO DELETE FROM case_41_parent WHERE name = 'stale'",
    # translates: EVERY 1 HOUR, MySQL-dialect body (IFNULL + NOW())
    "CREATE EVENT `hourly_rollup` ON SCHEDULE EVERY 1 HOUR "
    "COMMENT 'hourly activity rollup' "
    "DO INSERT INTO case_41_parent (name) "
    "SELECT IFNULL(CONCAT('roll-', DATE_FORMAT(NOW(), '%Y-%m-%d')), 'x')",
    # refused: one-shot AT has no pg_cron analog
    "CREATE EVENT `one_shot_cleanup` ON SCHEDULE "
    "AT '2030-01-01 00:00:00' "
    "DO DELETE FROM case_41_parent WHERE name = 'tmp'",
    # emulated (round 13): 60 % 7 != 0 — period guard in a DO block
    "CREATE EVENT `odd_cadence` ON SCHEDULE EVERY 7 MINUTE "
    "DO DELETE FROM case_41_parent WHERE name = 'odd'",
    # scheduled INACTIVE (round 13): DISABLE'd at the source
    "CREATE EVENT `paused_purge` ON SCHEDULE EVERY 2 DAY "
    "STARTS '2024-03-01 04:30:00' DISABLE "
    "DO DELETE FROM case_41_parent WHERE name = 'paused'",
    # migrates as procedure + scheduled CALL (round 12b)
    "CREATE EVENT `nightly_compound` ON SCHEDULE EVERY 1 DAY DO BEGIN "
    "DELETE FROM case_41_parent WHERE name = 'a'; "
    "DELETE FROM case_41_parent WHERE name = 'b'; END",
    # migrates + a second self-unscheduling one-shot at the ENDS match
    "CREATE EVENT `bounded_window` ON SCHEDULE EVERY 1 HOUR "
    "STARTS '2026-01-01 00:15:00' ENDS '2026-06-01 00:00:00' "
    "DO DELETE FROM case_41_parent WHERE name = 'window'",
]

#: Edge-row corpus (round 15, VERDICT r14 ask #7): the nastiest shapes
#: the dump-path capstones cover as unit fixtures, folded into the
#: rendered corpus so the LIVE-catalog replay proves the identical
#: migration on them — a generated column whose expression carries a
#: charset introducer, a functional index (information_schema reports
#: column_name NULL + EXPRESSION), multi-byte table/column comments
#: with embedded quotes, and a RANGE table with NAMED subpartition
#: lists in mysqldump's /*!50100 …*/ + per-subpartition ENGINE
#: spelling. Each is seeded so checksum parity is meaningful.
EXTRA_TABLES: list[tuple[str, str, list[str]]] = [
    (
        "edge_gen_fn_comments",
        "CREATE TABLE `edge_gen_fn_comments` (\n"
        "  `id` int NOT NULL,\n"
        "  `name` varchar(64) NOT NULL "
        "COMMENT 'Straße — can''t be NULL, 多字节',\n"
        "  `label` varchar(80) GENERATED ALWAYS AS "
        "(concat(_utf8mb4'pfx-',`name`)) STORED,\n"
        "  PRIMARY KEY (`id`),\n"
        "  KEY `idx_edge_fn` ((lower(`name`)))\n"
        ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4 "
        "COMMENT='weiß ''Prüfung'' 注释'",
        [
            "INSERT INTO `edge_gen_fn_comments` (`id`, `name`) VALUES "
            "(1,'Straße'),(2,'weiß'),(3,'plain ascii');",
        ],
    ),
    (
        "edge_named_subparts",
        "CREATE TABLE `edge_named_subparts` (\n"
        "  `id` int NOT NULL,\n"
        "  `region` varchar(16) NOT NULL,\n"
        "  `amount` decimal(10,2) DEFAULT NULL,\n"
        "  PRIMARY KEY (`id`)\n"
        ") ENGINE=InnoDB DEFAULT CHARSET=utf8mb4\n"
        "/*!50100 PARTITION BY RANGE (`id`)\n"
        "SUBPARTITION BY HASH (`id`)\n"
        "(PARTITION p_low VALUES LESS THAN (100)\n"
        " (SUBPARTITION sp_low_a ENGINE = InnoDB,\n"
        "  SUBPARTITION sp_low_b ENGINE = InnoDB),\n"
        " PARTITION p_high VALUES LESS THAN MAXVALUE\n"
        " (SUBPARTITION sp_high_a ENGINE = InnoDB,\n"
        "  SUBPARTITION sp_high_b ENGINE = InnoDB)) */",
        [
            "INSERT INTO `edge_named_subparts` VALUES "
            "(5,'north',10.50),(42,'south',NULL),(150,'east',99.99),"
            "(7000,'west',0.01);",
        ],
    ),
]

_TRG_SAVE = """\
/*!50003 SET @saved_cs_client      = @@character_set_client */ ;
/*!50003 SET @saved_cs_results     = @@character_set_results */ ;
/*!50003 SET @saved_col_connection = @@collation_connection */ ;
/*!50003 SET character_set_client  = utf8mb4 */ ;
/*!50003 SET character_set_results = utf8mb4 */ ;
/*!50003 SET collation_connection  = utf8mb4_0900_ai_ci */ ;
/*!50003 SET @saved_sql_mode       = @@sql_mode */ ;
/*!50003 SET sql_mode              = 'ONLY_FULL_GROUP_BY,STRICT_TRANS_TABLES' */ ;
"""

_TRG_RESTORE = """\
/*!50003 SET sql_mode              = @saved_sql_mode */ ;
/*!50003 SET character_set_client  = @saved_cs_client */ ;
/*!50003 SET character_set_results = @saved_cs_results */ ;
/*!50003 SET collation_connection  = @saved_col_connection */ ;
"""


def _render_trigger(ddl: str) -> str:
    """One trigger in mysqldump 8.0 layout: the /*!50003*/ session wrap
    + DELIMITER switch + /*!50017 DEFINER*/-wrapped CREATE."""
    wrapped = re.sub(
        r"(?is)^\s*CREATE\s+TRIGGER",
        "/*!50003 CREATE*/ /*!50017 DEFINER=`root`@`localhost`*/"
        " /*!50003 TRIGGER",
        ddl.rstrip().rstrip(";"),
        count=1,
    )
    return (
        _TRG_SAVE
        + "DELIMITER ;;\n"
        + wrapped
        + " */;;\n"
        + "DELIMITER ;\n"
        + _TRG_RESTORE
    )

HEADER = """\
-- MySQL dump 10.13  Distrib 8.0.36, for Linux (x86_64)
--
-- Host: localhost    Database: testdb
-- ------------------------------------------------------
-- Server version\t8.0.36

/*!40101 SET @OLD_CHARACTER_SET_CLIENT=@@CHARACTER_SET_CLIENT */;
/*!40101 SET @OLD_CHARACTER_SET_RESULTS=@@CHARACTER_SET_RESULTS */;
/*!40101 SET @OLD_COLLATION_CONNECTION=@@COLLATION_CONNECTION */;
/*!50503 SET NAMES utf8mb4 */;
/*!40103 SET @OLD_TIME_ZONE=@@TIME_ZONE */;
/*!40103 SET TIME_ZONE='+00:00' */;
/*!40014 SET @OLD_UNIQUE_CHECKS=@@UNIQUE_CHECKS, UNIQUE_CHECKS=0 */;
/*!40014 SET @OLD_FOREIGN_KEY_CHECKS=@@FOREIGN_KEY_CHECKS, FOREIGN_KEY_CHECKS=0 */;
/*!40101 SET @OLD_SQL_MODE=@@SQL_MODE, SQL_MODE='NO_AUTO_VALUE_ON_ZERO' */;
/*!40111 SET @OLD_SQL_NOTES=@@SQL_NOTES, SQL_NOTES=0 */;
"""

FOOTER = """\
/*!40103 SET TIME_ZONE=@OLD_TIME_ZONE */;

/*!40101 SET SQL_MODE=@OLD_SQL_MODE */;
/*!40014 SET FOREIGN_KEY_CHECKS=@OLD_FOREIGN_KEY_CHECKS */;
/*!40014 SET UNIQUE_CHECKS=@OLD_UNIQUE_CHECKS */;
/*!40101 SET CHARACTER_SET_CLIENT=@OLD_CHARACTER_SET_CLIENT */;
/*!40101 SET CHARACTER_SET_RESULTS=@OLD_CHARACTER_SET_RESULTS */;
/*!40101 SET COLLATION_CONNECTION=@OLD_COLLATION_CONNECTION */;
/*!40111 SET SQL_NOTES=@OLD_SQL_NOTES */;

-- Dump completed on 2026-08-15  0:00:00
"""


def _statements(path: str) -> list[str]:
    from mysql2pg_spark.sources.dumpfile import iter_sql_statements

    with open(path, encoding="utf-8", errors="replace") as fh:
        return list(iter_sql_statements(fh.read()))


def _fold_indexes(create_stmt: str, specs: list[tuple[bool, str, str]]) -> str:
    """Inline the table's standalone CREATE INDEX statements as
    `KEY`/`UNIQUE KEY` lines before the closing paren — the spelling
    mysqldump itself always uses for secondary indexes."""
    if not specs:
        return create_stmt
    cut = create_stmt.rfind("\n)")
    if cut < 0:
        return create_stmt
    lines = [
        "  {}KEY `{}` ({})".format("UNIQUE " if uq else "", name, cols)
        for uq, name, cols in specs
    ]
    return (
        create_stmt[:cut].rstrip().rstrip(",")
        + ",\n"
        + ",\n".join(lines)
        + create_stmt[cut:]
    )


def _view_columns(body: str) -> list[str]:
    """Heuristic output-column names for the /*!50001 temp-table
    stand-in (MySQL discards the stand-in at restore; names need only
    be plausible). Splits the top-level select list and takes the
    trailing alias / identifier of each item."""
    mo = re.match(r"(?is)^\s*SELECT\s+(.*?)\s+FROM\s", body)
    if not mo:
        return ["c1"]
    items, depth, buf = [], 0, []
    for ch in mo.group(1):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    items.append("".join(buf))
    names = []
    for it in items:
        it = it.strip()
        m = re.search(r"(?is)\s+AS\s+`?(\w+)`?\s*$", it)
        if not m:
            m = re.search(r"`?(\w+)`?\s*$", it)
        names.append(m.group(1) if m else f"c{len(names) + 1}")
    return names


def render_corpus_dump(
    out_path: str,
    tables_sql: str = f"{REF}/create_table.sql",
    index_sql: str = f"{REF}/create_index.sql",
    seed_sql: str = f"{REF}/insert_data.sql",
    views_sql: str = f"{REF}/create_view.sql",
    functions_sql: str = f"{REF}/create_function.sql",
) -> str:
    from mysql2pg_spark.sources.dumpfile import functions_from_sql

    # standalone indexes grouped by owning table
    idx_by_table: dict[str, list[tuple[bool, str, str]]] = {}
    for stmt in _statements(index_sql):
        mo = _IDX_RE.match(stmt)
        if mo:
            idx_by_table.setdefault(mo.group(3).lower(), []).append(
                (bool(mo.group(1)), mo.group(2), mo.group(4))
            )

    inserts_by_table: dict[str, list[str]] = {}
    for stmt in _statements(seed_sql):
        mo = _INSERT_RE.match(stmt)
        if mo:
            # mysqldump emits each INSERT as ONE line (the property the
            # distributed dump reader splits on) — collapse the corpus'
            # hand-wrapped multi-line spellings
            inserts_by_table.setdefault(mo.group(1).lower(), []).append(
                re.sub(r"\s*\n\s*", " ", stmt)
            )

    views: list[tuple[str, str]] = []
    for stmt in _statements(views_sql):
        mo = _VIEW_RE.match(stmt)
        if mo:
            views.append((mo.group(1), re.sub(r"\s*\n\s*", " ", mo.group(2))))

    parts: list[str] = [HEADER]

    def emit_table(t: str, stmt: str, rows: list[str] | None) -> None:
        parts.append(
            f"""
--
-- Table structure for table `{t}`
--

DROP TABLE IF EXISTS `{t}`;
/*!40101 SET @saved_cs_client     = @@character_set_client */;
/*!50503 SET character_set_client = utf8mb4 */;
{stmt};
/*!40101 SET character_set_client = @saved_cs_client */;
"""
        )
        body = (
            ";\n".join(r.rstrip().rstrip(";") for r in rows) + ";\n"
            if rows
            else ""
        )
        parts.append(
            f"""
--
-- Dumping data for table `{t}`
--

LOCK TABLES `{t}` WRITE;
/*!40000 ALTER TABLE `{t}` DISABLE KEYS */;
{body}/*!40000 ALTER TABLE `{t}` ENABLE KEYS */;
UNLOCK TABLES;
"""
        )
        # mysqldump emits the table's triggers right after its data
        for trg in TRIGGERS.get(t.lower(), []):
            parts.append(_render_trigger(trg))

    for stmt in _statements(tables_sql):
        mo = _CT_RE.match(stmt)
        if not mo:
            continue
        t = mo.group(1)
        stmt = _fold_indexes(stmt, idx_by_table.get(t.lower(), []))
        if not re.search(r"(?i)ENGINE\s*=", stmt):
            stmt += " ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
        emit_table(t, stmt, inserts_by_table.get(t.lower()))

    # edge-row tables (round 15): rendered through the identical
    # structure/data blocks so both capstones migrate them
    for t, stmt, seed in EXTRA_TABLES:
        emit_table(t, stmt, seed)

    # view stand-ins (table section order, as mysqldump interleaves)
    for name, body in views:
        cols = ",\n".join(f" 1 AS `{c}`" for c in _view_columns(body))
        parts.append(
            f"""
--
-- Temporary view structure for view `{name}`
--

DROP TABLE IF EXISTS `{name}`;
/*!50001 DROP VIEW IF EXISTS `{name}`*/;
SET @saved_cs_client     = @@character_set_client;
/*!50503 SET character_set_client = utf8mb4 */;
/*!50001 CREATE TABLE `{name}` (
{cols}
) ENGINE=MyISAM */;
SET character_set_client = @saved_cs_client;
"""
        )

    # --routines section
    parts.append(
        "\n--\n-- Dumping routines for database 'testdb'\n--\n"
    )
    for fn in functions_from_sql(functions_sql):
        name = _FN_NAME_RE.match(fn).group(1)
        wrapped = re.sub(
            r"(?is)^\s*CREATE\s+FUNCTION",
            "/*!50003 CREATE*/ /*!50020 DEFINER=`root`@`localhost`*/"
            " /*!50003 FUNCTION",
            fn.rstrip().rstrip(";"),
            count=1,
        )
        parts.append(
            f"""\
/*!50003 DROP FUNCTION IF EXISTS `{name}` */;
/*!50003 SET @saved_cs_client      = @@character_set_client */ ;
/*!50003 SET @saved_cs_results     = @@character_set_results */ ;
/*!50003 SET @saved_col_connection = @@collation_connection */ ;
/*!50003 SET character_set_client  = utf8mb4 */ ;
/*!50003 SET character_set_results = utf8mb4 */ ;
/*!50003 SET collation_connection  = utf8mb4_0900_ai_ci */ ;
/*!50003 SET @saved_sql_mode       = @@sql_mode */ ;
/*!50003 SET sql_mode              = 'ONLY_FULL_GROUP_BY,STRICT_TRANS_TABLES' */ ;
DELIMITER ;;
{wrapped} */;;
DELIMITER ;
/*!50003 SET sql_mode              = @saved_sql_mode */ ;
/*!50003 SET character_set_client  = @saved_cs_client */ ;
/*!50003 SET character_set_results = @saved_cs_results */ ;
/*!50003 SET collation_connection  = @saved_col_connection */ ;
"""
        )

    # --events section (mysqldump 8.0 layout: after routines, before
    # the final views; /*!50106*/ wrap + DELIMITER switch). PG has no
    # event scheduler, so the pipeline must INVENTORY these as
    # documented skips (round 9) — a real `mysqldump --events` artifact
    # carries them and silence would drop scheduled jobs invisibly.
    parts.append(
        "\n--\n-- Dumping events for database 'testdb'\n--\n"
    )
    for ev in EVENTS:
        wrapped = re.sub(
            r"(?is)^\s*CREATE\s+EVENT",
            "/*!50106 CREATE*/ /*!50117 DEFINER=`root`@`localhost`*/"
            " /*!50106 EVENT",
            ev.rstrip().rstrip(";"),
            count=1,
        )
        parts.append(
            "/*!50106 SET @save_time_zone= @@TIME_ZONE */ ;\n"
            "DELIMITER ;;\n"
            + wrapped
            + " */ ;;\n"
            "DELIMITER ;\n"
            "/*!50106 SET TIME_ZONE= @save_time_zone */ ;\n"
        )

    # final view definitions (mysqldump emits them after all data)
    for name, body in views:
        parts.append(
            f"""
--
-- Final view structure for view `{name}`
--

/*!50001 DROP VIEW IF EXISTS `{name}`*/;
/*!50001 SET @saved_cs_client          = @@character_set_client */;
/*!50001 SET @saved_cs_results         = @@character_set_results */;
/*!50001 SET @saved_col_connection     = @@collation_connection */;
/*!50001 SET character_set_client      = utf8mb4 */;
/*!50001 SET character_set_results     = utf8mb4 */;
/*!50001 SET collation_connection      = utf8mb4_0900_ai_ci */;
/*!50001 CREATE ALGORITHM=UNDEFINED */
/*!50013 DEFINER=`root`@`localhost` SQL SECURITY DEFINER */
/*!50001 VIEW `{name}` AS {body} */;
/*!50001 SET character_set_client      = @saved_cs_client */;
/*!50001 SET character_set_results     = @saved_cs_results */;
/*!50001 SET collation_connection     = @saved_col_connection */;
"""
        )

    parts.append("\n" + FOOTER)
    text = "\n".join(parts)
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write(text)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus_dump.sql"
    print(render_corpus_dump(out))
