package graft.lake

import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.concurrent.atomic.AtomicInteger

/** Threaded optimistic-concurrency commit micro-harness — the MEASURED
  * counterpart of the modeled [[Snapshots.concurrentCommitStats]]
  * (`lake_concurrent_commits`). The reference's concurrent-writer study
  * (reference: poc/test_concurrent_writers.py:33,208) races real
  * `threading.Thread` writers through a lock + retry loop and reports
  * conflict/retry pressure per writer count; this harness does the same with
  * JVM threads against a filesystem commit log, using the actual Iceberg/
  * Delta publication primitive: an ATOMIC create of the next numbered
  * commit file (`Files.createFile` is atomic on POSIX — exactly one racer
  * wins `v{n+1}`; the losers observe `FileAlreadyExistsException`, re-read
  * the log head and retry, which IS optimistic concurrency control).
  *
  * Per commit attempt a writer:
  *  1. reads the current log head (max committed version);
  *  2. "prepares" its commit — writes a small manifest-ish payload to an
  *     uncommitted temp file (the work a real writer does off the critical
  *     path, which is why OCC scales until conflicts dominate);
  *  3. attempts the atomic publish of head+1; on conflict, counts a retry
  *     and goes back to 1.
  *
  * The ladder reports, per writer count: total commits, total conflicts,
  * wall seconds, commits/sec and mean retries per commit — the measured
  * shape the reference plots (throughput flattening and retry pressure
  * growing with writer count while total commits stay exact: no commit is
  * ever lost or duplicated, the property the modeled operator assumes). */
object OccBench {

  final case class OccResult(writers: Int, commits: Int, conflicts: Int, sec: Double)

  private def latestVersion(dir: Path): Int = {
    val names = dir.toFile.list()
    if (names == null) 0
    else names.iterator
      .filter(n => n.startsWith("v") && n.endsWith(".commit"))
      .map(n => n.stripPrefix("v").stripSuffix(".commit").toInt)
      .foldLeft(0)(math.max)
  }

  /** One rung: `writers` threads × `commitsPerWriter` commits each. */
  def run(writers: Int, commitsPerWriter: Int = 40): OccResult = {
    val dir = Files.createTempDirectory("graft_occ_")
    try {
      Files.createFile(dir.resolve("v000000.commit")) // seed snapshot
      val conflicts = new AtomicInteger(0)
      val payload = ("{\"schema_id\":1,\"added_files\":3,\"op\":\"append\"}" * 8)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val threads = (0 until writers).map { w =>
        new Thread(() => {
          var done = 0
          while (done < commitsPerWriter) {
            val head = latestVersion(dir)
            // Prepare off the critical path: stage the commit's metadata.
            val staged = dir.resolve(s"staged_w${w}_$done.tmp")
            Files.write(staged, payload, StandardOpenOption.CREATE,
              StandardOpenOption.TRUNCATE_EXISTING)
            try {
              Files.createFile(dir.resolve(f"v${head + 1}%06d.commit"))
              done += 1
            } catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                conflicts.incrementAndGet() // lost the race — re-read head, retry
            }
          }
        }, s"occ-writer-$w")
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start())
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val committed = latestVersion(dir)
      require(committed == writers * commitsPerWriter,
        s"OCC invariant broken: $committed committed, expected ${writers * commitsPerWriter}")
      OccResult(writers, committed, conflicts.get(), sec)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  /** The reference study's writer ladder. */
  def ladder(writerCounts: Seq[Int] = Seq(1, 2, 4, 8)): Seq[OccResult] =
    writerCounts.map(run(_))
}
