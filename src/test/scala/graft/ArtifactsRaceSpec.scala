package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.hadoop.fs.Path

/** Race injection for the cross-session artifact store's publish step.
  * The hazard (pre-round-12 code): between a publisher's absence check
  * and its rename, a second session could publish — and on Hadoop
  * filesystems rename onto an existing directory NESTS the source
  * inside it, so the loser's tmp dir landed inside the winner's
  * `_SUCCESS`-carrying artifact and every later session silently read
  * doubled rows. [[Artifacts.publish]] now serializes publishers
  * through an atomic claim file; the `onClaimHeld` seam lets these
  * tests schedule a competitor inside the exact window that used to
  * corrupt. */
class ArtifactsRaceSpec extends SparkSpec {

  private val hconf = spark.sparkContext.hadoopConfiguration

  private def tempRoot(): String = java.nio.file.Files
    .createTempDirectory("graft-artifact-race").toString

  /** One parquet copy of `n` rows tagged `src`, in its own tmp dir. */
  private def writeTmp(root: String, src: String, n: Int): Path = {
    import org.apache.spark.sql.functions.lit
    val tmp = new Path(s"$root/art.tmp-${java.util.UUID.randomUUID()}")
    spark.range(n).toDF("id").withColumn("src", lit(src))
      .coalesce(1).write.parquet(tmp.toString)
    tmp
  }

  private def childNames(p: Path): Seq[String] = {
    val fs = p.getFileSystem(hconf)
    fs.listStatus(p).map(_.getPath.getName).toSeq
  }

  test("a competitor publishing inside the claim window cannot nest " +
      "its tmp into the artifact") {
    val root = tempRoot()
    val hPath = new Path(s"$root/art")
    val fs = hPath.getFileSystem(hconf)
    val tmpA = writeTmp(root, "A", 10)
    val tmpB = writeTmp(root, "B", 10)
    var bWon = false
    // A holds the claim; B attempts a full publish inside A's window —
    // the interleaving that used to nest B's rename into A's dir (or
    // vice versa). B must be locked out entirely.
    val aWon = Artifacts.publish(fs, tmpA, hPath, { () =>
      bWon = Artifacts.publish(fs, tmpB, hPath)
    })
    assert(aWon && !bWon, "the claim holder and only it publishes")
    val kids = childNames(hPath)
    assert(kids.contains("_SUCCESS"))
    assert(!kids.exists(_.contains(".tmp-")),
      s"published artifact must hold no nested tmp dir, got $kids")
    assert(!fs.exists(tmpB), "the loser's tmp copy is discarded")
    val rows = spark.read.parquet(hPath.toString).collect()
    assert(rows.length == 10 &&
      rows.forall(_.getString(1) == "A"), "exactly one clean copy")
  }

  test("the torn-write cleanup re-checks _SUCCESS under the claim " +
      "and never deletes a racer's good publish") {
    val root = tempRoot()
    val hPath = new Path(s"$root/art")
    val fs = hPath.getFileSystem(hconf)
    // a torn write: a final dir WITHOUT the marker
    fs.mkdirs(new Path(hPath, "part-torn"))
    val tmpA = writeTmp(root, "A", 5)
    val tmpGood = writeTmp(root, "GOOD", 5)
    // inside A's claim window a raw writer (no claim discipline)
    // replaces the torn dir with a good _SUCCESS-carrying publish;
    // A must then stand down instead of deleting it as torn
    val aWon = Artifacts.publish(fs, tmpA, hPath, { () =>
      fs.delete(hPath, true)
      fs.rename(tmpGood, hPath): Unit
    })
    assert(!aWon, "a good publish observed under the claim wins")
    assert(!fs.exists(tmpA), "the stand-down discards A's tmp")
    val rows = spark.read.parquet(hPath.toString).collect()
    assert(rows.length == 5 && rows.forall(_.getString(1) == "GOOD"),
      "the racer's good copy survives intact")
  }

  test("a fresh foreign claim blocks publishing; a stale one is " +
      "broken and taken over") {
    val root = tempRoot()
    val hPath = new Path(s"$root/art")
    val fs = hPath.getFileSystem(hconf)
    val claim = new Path(s"$root/art.claim")
    fs.createNewFile(claim)
    val tmpA = writeTmp(root, "A", 3)
    assert(!Artifacts.publish(fs, tmpA, hPath),
      "a live claim held elsewhere blocks the publish")
    assert(!fs.exists(hPath), "nothing was published")
    // the claim goes stale (its holder crashed 16 minutes ago)
    val old = System.currentTimeMillis() - 16L * 60 * 1000
    fs.setTimes(claim, old, old)
    val tmpB = writeTmp(root, "B", 3)
    assert(Artifacts.publish(fs, tmpB, hPath),
      "a stale claim is broken exactly once and taken over")
    assert(childNames(hPath).contains("_SUCCESS"))
    assert(spark.read.parquet(hPath.toString).collect()
      .forall(_.getString(1) == "B"))
  }

  test("a taker that lost the stale-claim race hands back the " +
      "winner's fresh claim instead of breaking it") {
    val root = tempRoot()
    val fs = new Path(root).getFileSystem(hconf)
    val claim = new Path(s"$root/art.claim")
    fs.createNewFile(claim)
    val old = System.currentTimeMillis() - 16L * 60 * 1000
    fs.setTimes(claim, old, old) // holder crashed 16 minutes ago
    var winnerOwns = false
    // B observes the stale claim; inside the observation window the
    // competing taker A completes its ENTIRE takeover (break + fresh
    // createNewFile). Pre-fix delete-then-create code had B delete
    // A's fresh claim and claim too — two owners. B must instead
    // detect the freshly-captured claim and restore it.
    val bOwns = Artifacts.takeoverStaleClaim(fs, claim,
      () => fs.createNewFile(claim),
      onObservedStale = { () =>
        winnerOwns = Artifacts.takeoverStaleClaim(fs, claim,
          () => fs.createNewFile(claim))
      })
    assert(winnerOwns, "the takeover completing first owns the claim")
    assert(!bOwns, "the late taker must NOT also acquire ownership")
    assert(fs.exists(claim), "the winner's fresh claim survives")
    assert(System.currentTimeMillis() -
      fs.getFileStatus(claim).getModificationTime < 60 * 1000,
      "the surviving claim is the winner's FRESH one, not the stale")
    val kids = fs.listStatus(new Path(root)).map(_.getPath.getName)
    assert(!kids.exists(_.contains(".tomb-")),
      s"no tombstone may survive the takeover, got ${kids.toSeq}")
  }

  test("a publisher whose claim was stolen stands down instead of " +
      "publishing (ownership is content-verified, not positional)") {
    // the residual three-party race: publisher A holds a fresh claim;
    // in A's window a taker steals it (tombstone rename against a
    // stale observation) and a THIRD session claims the vacant path.
    // Positionally a claim file exists under A's feet — but it is not
    // A's. A must re-read the claim, see a foreign owner, refuse to
    // publish, and refuse to delete the foreign claim on release.
    val root = tempRoot()
    val fs = new Path(root).getFileSystem(hconf)
    val hPath = new Path(s"$root/art")
    val claim = new Path(s"$root/art.claim")
    val tmpA = writeTmp(root, "A", 2)
    val aWon = Artifacts.publish(fs, tmpA, hPath, { () =>
      // simulate steal + third-party reclaim inside A's window
      fs.delete(claim, false)
      val out = fs.create(claim, true)
      try out.write("thief-owner".getBytes("UTF-8")) finally out.close()
    })
    assert(!aWon, "a publisher with a stolen claim must not publish")
    assert(!fs.exists(hPath), "nothing may be published without the claim")
    assert(fs.exists(claim), "the foreign claim must survive A's release")
    val in = fs.open(claim)
    val buf = new Array[Byte](64)
    val n = try in.read(buf) finally in.close()
    assert(new String(buf, 0, n, "UTF-8") == "thief-owner",
      "the foreign claim's content must be untouched")
    assert(!fs.exists(tmpA), "the loser's tmp dir is discarded")
  }

  test("two concurrent loadOrWrite sessions publish one clean copy " +
      "and both serve identical rows") {
    val store = tempRoot()
    val dsDir = s"race-ds-${java.util.UUID.randomUUID()}"
    val latch = new CountDownLatch(2)
    def run(): Array[Long] = {
      val s = spark.newSession()
      s.conf.set("graft.artifacts.dir", store)
      Artifacts.cached(s, dsDir, "race_art") {
        // hold both builds open so BOTH sessions reach the publish
        // step believing the store is empty — the widest race window
        latch.countDown()
        assert(latch.await(60, TimeUnit.SECONDS), "peer never arrived")
        s.range(100).toDF("id")
      }.collect().map(_.getLong(0)).sorted
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val task = new java.util.concurrent.Callable[Array[Long]] {
        def call(): Array[Long] = run()
      }
      val (fa, fb) = (pool.submit(task), pool.submit(task))
      val (ra, rb) = (fa.get(120, TimeUnit.SECONDS),
        fb.get(120, TimeUnit.SECONDS))
      assert(ra.toSeq == (0L until 100L).toSeq && rb.toSeq == ra.toSeq)
    } finally pool.shutdownNow()
    // the store holds exactly one clean, marker-carrying copy
    val dsKey = java.security.MessageDigest.getInstance("MD5")
      .digest(dsDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val art = new Path(s"$store/$dsKey/race_art")
    val kids = childNames(art)
    assert(kids.contains("_SUCCESS"))
    assert(!kids.exists(_.contains(".tmp-")),
      s"no nested tmp dir may survive, got $kids")
    val siblings = childNames(art.getParent)
    assert(!siblings.contains("race_art.claim"),
      "the claim is released after publishing")
    assert(!siblings.exists(_.contains(".tmp-")),
      s"loser tmp dirs are discarded, got $siblings")
    assert(spark.read.parquet(art.toString).count() == 100)
  }
}
