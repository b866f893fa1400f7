package graft

/** Dump-time context for DEFERRED oracles that depend on the fixture
  * dir (e.g. q226 embeds a corpus-trained vocab): graft.Verify records
  * the dir it is dumping BEFORE generating oracle SQL, so a deferred
  * generator can rebuild dir-dependent model state even when its query
  * was filtered out of the dump (SPARK_GRAFT_ONLY local iteration).
  */
object OracleContext {
  @volatile var dir: String = _
}
