package graft.slowlog

/** Shared slow-log text fixtures (FIXTURES.md §B). */
object SlowLogFixtures {

  /** FIXTURES.md slow001.log, verbatim: ISO Time, User@Host, basic +
    * Percona-extended metrics, use, SET timestamp, multi-line SQL, admin
    * command, IN-list for the fingerprint. */
  val slow001: String =
    """# Time: 2024-01-15T10:00:01.123456Z
      |# User@Host: appuser[appuser] @ web01 [10.0.0.5]  Id:    42
      |# Query_time: 0.003218  Lock_time: 0.000087 Rows_sent: 10  Rows_examined: 1000
      |use orders_db;
      |SET timestamp=1705312801;
      |SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_custkey IN (1, 2, 3) AND o_orderstatus = 'F';
      |# Time: 2024-01-15T10:00:02.000000Z
      |# User@Host: appuser[appuser] @ web01 [10.0.0.5]  Id:    42
      |# Query_time: 1.500000  Lock_time: 0.010000 Rows_sent: 0  Rows_examined: 500000
      |# Thread_id: 42  Schema: orders_db  QC_hit: No
      |# Full_scan: Yes  Full_join: No  Tmp_table: Yes  Tmp_table_on_disk: No
      |# Filesort: Yes  Filesort_on_disk: No  Merge_passes: 0
      |# InnoDB_IO_r_ops: 100  InnoDB_IO_r_bytes: 1638400  InnoDB_IO_r_wait: 0.500000
      |# InnoDB_rec_lock_wait: 0.000000  InnoDB_queue_wait: 0.000000  InnoDB_pages_distinct: 64
      |SET timestamp=1705312802;
      |INSERT INTO audit (a, b) VALUES (1, 'x'), (2, 'y');
      |# Time: 2024-01-15T10:00:03.000000Z
      |# User@Host: root[root] @ localhost []  Id:    43
      |# Query_time: 0.000010  Lock_time: 0.000000 Rows_sent: 0  Rows_examined: 0
      |SET timestamp=1705312803;
      |# administrator command: Quit;
      |""".stripMargin
}
