package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.LongType

import scala.collection.mutable

/** One-task local solvers for the iterative fixpoints in [[Graph]]
  * (round-19 optimization pass).
  *
  * Why this exists (optimization guide §1.2 "the distributed algorithm",
  * §2.2 "shuffles get relatively slower as you scale out"): every
  * fixpoint loop in [[Graph]] pays per ROUND one or more shuffles, a
  * localCheckpoint materialization and a job-scheduling round trip —
  * measured 0.2–0.4 s per round at local sandbox scale REGARDLESS of
  * data size (the q_bowtie SCC refinement spent 5.2 s on a 1 000-node /
  * 4 373-edge graph: 10 inner rounds × fixed round overhead, zero bytes
  * of real work). When the edge relation is small enough to fit one
  * task's working set, the exact same fixpoint is a sub-millisecond
  * in-memory computation — so each loop gates on the (already
  * checkpointed, hence cheap-to-count) edge count and, below the
  * threshold, runs its fixpoint inside ONE `mapPartitions` task on an
  * executor instead of N synchronized rounds. This is the standard
  * hybrid of production graph engines, and it is NOT a local-mode-only
  * trick: at cluster scale the FW-BW open remainder, the CC
  * condensation, and the k-core/k-truss peel tail all shrink
  * monotonically — the threshold is exactly the point where paying
  * another synchronization round costs more than finishing the tail in
  * one task (the straggler/tail argument of guide §2.6).
  *
  * Contract parity: every kernel replicates its distributed loop's
  * semantics EXACTLY — same round structure, same round budgets and
  * [[IllegalStateException]] non-convergence contracts, same integer
  * arithmetic (the fixpoints were already designed integer-exact for
  * oracle parity, so bit-identical results are provable, and
  * LocalSolveSpec re-verifies equality against the distributed path on
  * every algorithm). Nothing is driver-sized: the kernel runs inside an
  * executor task (`coalesce(1).mapPartitions`), and the output flows
  * back as a DataFrame into the same downstream joins.
  *
  * Gating: `spark.graft.graph.localSolveEdges` (default 4 194 304 ≈ one
  * task's comfortable working set of (long, long) pairs; 0 disables —
  * the distributed paths are untouched and remain the ≥-threshold
  * route). The gate only engages when every graph column is LongType
  * (all graft callers; anything else falls through to the distributed
  * path untouched).
  */
private[graph] object LocalSolve {

  def threshold(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.graph.localSolveEdges")
      .map(_.toLong).getOrElse(1L << 22)

  /** The relation must be materialized (checkpointed) by the caller so
    * this count is a cheap scan, not a recompute. Returns None when the
    * local path is disabled or the relation is over-threshold. */
  def fits(df: DataFrame): Option[Long] = {
    val thr = threshold(df.sparkSession)
    if (thr <= 0L) None
    else {
      val n = df.count()
      if (n <= thr) Some(n) else None
    }
  }

  def allLong(df: DataFrame, cols: String*): Boolean =
    cols.forall(c => df.schema(c).dataType == LongType)

  /** Run `fn` over the whole dataset in ONE executor task (coalesce —
    * no exchange; the single task reads the checkpointed blocks). */
  private def oneTask[T, U: org.apache.spark.sql.Encoder](
      ds: Dataset[T])(fn: Iterator[T] => Iterator[U]): Dataset[U] =
    ds.coalesce(1).mapPartitions(fn)

  /** Eagerly materialize a kernel's output (one job; downstream
    * consumers then read the checkpointed blocks instead of re-running
    * the kernel — the distributed loops' per-round-checkpoint parity),
    * and surface the kernel's round-budget contract exceptions at CALL
    * time with their original type, unwrapped from Spark's task-failure
    * wrapper — the distributed loops throw eagerly too. */
  private def eager(df: DataFrame): DataFrame =
    try df.localCheckpoint(true)
    catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c != null) {
          c match {
            case i: IllegalStateException =>
              throw new IllegalStateException(i.getMessage)
            case i: IllegalArgumentException =>
              throw new IllegalArgumentException(i.getMessage)
            case _ => ()
          }
          c = c.getCause
        }
        throw e
    }

  // ---------------------------------------------------------------- CC

  /** Synchronous min-label propagation over a DOUBLED edge list — the
    * [[Graph.connectedComponents]] round semantics verbatim: labels
    * live on the NODE universe only (an edge endpoint outside `nodes`
    * neither carries nor relays a label — exactly the distributed
    * join-on-labels restriction), and the converging round must fit the
    * maxIter budget. Input: tagged rows — (0, src, dst) doubled edges,
    * (2, id, 0) nodes. Output: (id, component) for every node. */
  def minLabelComponents(tagged: DataFrame, maxIter: Int): DataFrame = {
    val sp = tagged.sparkSession
    import sp.implicits._
    oneTask(tagged.as[(Int, Long, Long)]) { it =>
      val rows = it.toArray
      val lbl = new mutable.LongMap[Long]()
      rows.foreach { case (t, i2, _) => if (t == 2) lbl(i2) = i2 }
      val edges = rows.collect {
        case (0, s, d) if lbl.contains(s) && lbl.contains(d) => (s, d)
      }
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        // neighborMin: the distributed round joins edges on dst against
        // labels and aggregates min by src. Synchronous: read old
        // labels, write new.
        val nmin = new mutable.LongMap[Long]()
        edges.foreach { case (s, d) =>
          val l = lbl(d)
          val cur = nmin.getOrElse(s, Long.MaxValue)
          if (l < cur) nmin(s) = l
        }
        var changed = 0L
        nmin.foreachEntry { (id, m) =>
          if (m < lbl(id)) { lbl(id) = m; changed += 1 }
        }
        converged = changed == 0L
        iter += 1
      }
      if (!converged) throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "raise maxIter (rounds needed = component diameter)")
      lbl.iterator.map { case (id, c) => (id, c) }
    }.toDF("id", "component").transform(eager)
  }

  // --------------------------------------------------------------- SCC

  /** Iterative Tarjan SCC; output (id, component) with component = min
    * member id — the exact [[Graph.stronglyConnectedComponents]]
    * fixpoint (which refines until F = B = class min). Input edges need
    * not be deduped (Tarjan is insensitive); self-loops are fine. */
  def tarjanComponents(edges: DataFrame): DataFrame = {
    val sp = edges.sparkSession
    import sp.implicits._
    oneTask(edges.select("src", "dst").as[(Long, Long)]) { it =>
      val es = it.toArray
      // index nodes
      val idx = new mutable.LongMap[Int]()
      val ids = new mutable.ArrayBuffer[Long]()
      def ix(x: Long): Int = idx.getOrElse(x, {
        val i = ids.length; idx(x) = i; ids += x; i
      })
      es.foreach { case (s, d) => ix(s); ix(d) }
      val n = ids.length
      // CSR adjacency
      val deg = new Array[Int](n)
      es.foreach { case (s, _) => deg(idx(s)) += 1 }
      val off = new Array[Int](n + 1)
      var i = 0
      while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
      val pos = java.util.Arrays.copyOf(off, n)
      val adj = new Array[Int](es.length)
      es.foreach { case (s, d) =>
        val si = idx(s); adj(pos(si)) = idx(d); pos(si) += 1
      }
      // iterative Tarjan
      val UNSEEN = -1
      val index = Array.fill(n)(UNSEEN)
      val low = new Array[Int](n)
      val onStk = new Array[Boolean](n)
      val stk = new mutable.ArrayBuffer[Int]()
      val comp = new Array[Int](n)
      var nextIndex = 0
      var nComp = 0
      val callV = new mutable.ArrayBuffer[Int]()
      val callE = new mutable.ArrayBuffer[Int]()
      var v0 = 0
      while (v0 < n) {
        if (index(v0) == UNSEEN) {
          callV += v0; callE += off(v0)
          index(v0) = nextIndex; low(v0) = nextIndex; nextIndex += 1
          stk += v0; onStk(v0) = true
          while (callV.nonEmpty) {
            val v = callV.last
            var e = callE.last
            var descended = false
            while (!descended && e < off(v + 1)) {
              val w = adj(e)
              if (index(w) == UNSEEN) {
                callE(callE.length - 1) = e + 1
                callV += w; callE += off(w)
                index(w) = nextIndex; low(w) = nextIndex; nextIndex += 1
                stk += w; onStk(w) = true
                descended = true
              } else {
                if (onStk(w) && low(w) < low(v)) low(v) = low(w)
                e += 1
              }
            }
            if (!descended) {
              callE(callE.length - 1) = e
              callV.remove(callV.length - 1)
              callE.remove(callE.length - 1)
              if (callV.nonEmpty) {
                val p = callV.last
                if (low(v) < low(p)) low(p) = low(v)
              }
              if (low(v) == index(v)) {
                var done = false
                while (!done) {
                  val w = stk.remove(stk.length - 1)
                  onStk(w) = false
                  comp(w) = nComp
                  done = w == v
                }
                nComp += 1
              }
            }
          }
        }
        v0 += 1
      }
      // component representative = min member id
      val minId = Array.fill(nComp)(Long.MaxValue)
      i = 0
      while (i < n) {
        if (ids(i) < minId(comp(i))) minId(comp(i)) = ids(i)
        i += 1
      }
      (0 until n).iterator.map(j => (ids(j), minId(comp(j))))
    }.toDF("id", "component").transform(eager)
  }

  // ------------------------------------------------------ reachability

  /** Both-direction BFS with the [[Graph.reachability]] round budget:
    * rounds run while the previous round set a new flag; if round
    * `maxRounds` still made progress the fixpoint is uncertified and
    * the same IllegalStateException is thrown. Input: tagged rows —
    * (0, src, dst) edges, (1, id, 0) seeds. Output (id, f, b) for
    * seeds ∪ reached. */
  def reachabilityFlags(tagged: DataFrame, maxRounds: Int): DataFrame = {
    val sp = tagged.sparkSession
    import sp.implicits._
    oneTask(tagged.as[(Int, Long, Long)]) { it =>
      val rows = it.toArray
      val edges = rows.collect { case (0, s, d) => (s, d) }
      val seeds = rows.collect { case (1, s, _) => s }.distinct
      // adjacency maps
      val fwd = new mutable.LongMap[mutable.ArrayBuffer[Long]]()
      val bwd = new mutable.LongMap[mutable.ArrayBuffer[Long]]()
      edges.foreach { case (s, d) =>
        fwd.getOrElseUpdate(s, new mutable.ArrayBuffer[Long]()) += d
        bwd.getOrElseUpdate(d, new mutable.ArrayBuffer[Long]()) += s
      }
      val f = new mutable.LongMap[Boolean]()
      val b = new mutable.LongMap[Boolean]()
      seeds.foreach { s => f(s) = true; b(s) = true }
      var frontF = seeds.toSeq
      var frontB = seeds.toSeq
      var r = 0
      var done = false
      while (!done && r < maxRounds) {
        r += 1
        val nf = new mutable.ArrayBuffer[Long]()
        val nb = new mutable.ArrayBuffer[Long]()
        frontF.foreach { u =>
          fwd.get(u).foreach(_.foreach { v =>
            if (!f.getOrElse(v, false)) { f(v) = true; nf += v }
          })
        }
        frontB.foreach { u =>
          bwd.get(u).foreach(_.foreach { v =>
            if (!b.getOrElse(v, false)) { b(v) = true; nb += v }
          })
        }
        frontF = nf.toSeq
        frontB = nb.toSeq
        done = nf.isEmpty && nb.isEmpty
      }
      if (!done) throw new IllegalStateException(
        s"reachability frontier still growing after $maxRounds rounds")
      val out = mutable.LongMap[Unit]()
      f.keysIterator.foreach(out(_) = ())
      b.keysIterator.foreach(out(_) = ())
      out.keysIterator.map(id =>
        (id, f.getOrElse(id, false), b.getOrElse(id, false)))
    }.toDF("id", "f", "b").transform(eager)
  }

  // ------------------------------------------------------- hopDistance

  /** Multi-source BFS capped at maxHops — [[Graph.hopDistance]]
    * verbatim (output = seeds ∪ reached within the cap, min hops).
    * Input: (0, src, dst) edges, (1, id, 0) seeds. */
  def hopBfs(tagged: DataFrame, maxHops: Int): DataFrame = {
    val sp = tagged.sparkSession
    import sp.implicits._
    oneTask(tagged.as[(Int, Long, Long)]) { it =>
      val rows = it.toArray
      val fwd = new mutable.LongMap[mutable.ArrayBuffer[Long]]()
      rows.foreach {
        case (0, s, d) =>
          fwd.getOrElseUpdate(s, new mutable.ArrayBuffer[Long]()) += d
        case _ => ()
      }
      val dist = new mutable.LongMap[Long]()
      var frontier = new mutable.ArrayBuffer[Long]()
      rows.foreach {
        case (1, s, _) =>
          if (!dist.contains(s)) { dist(s) = 0L; frontier += s }
        case _ => ()
      }
      var h = 1
      while (h <= maxHops && frontier.nonEmpty) {
        val next = new mutable.ArrayBuffer[Long]()
        frontier.foreach { u =>
          fwd.get(u).foreach(_.foreach { v =>
            if (!dist.contains(v)) { dist(v) = h.toLong; next += v }
          })
        }
        frontier = next
        h += 1
      }
      dist.iterator.map { case (id, d) => (id, d) }
    }.toDF("id", "hops").transform(eager)
  }

  // ----------------------------------------------------- shortestPaths

  /** Round-synchronous Bellman–Ford with frontier pruning —
    * [[Graph.shortestPaths]] verbatim including the maxRounds cap (the
    * capped result is "min over paths with ≤ maxRounds edges", exactly
    * the distributed loop's documented semantics). Input: (0, src, dst,
    * w) edges, (1, id, 0, 0) seeds. */
  def bellmanFord(tagged: DataFrame, maxRounds: Int): DataFrame = {
    val sp = tagged.sparkSession
    import sp.implicits._
    oneTask(tagged.as[(Int, Long, Long, Long)]) { it =>
      val rows = it.toArray
      val adj = new mutable.LongMap[mutable.ArrayBuffer[(Long, Long)]]()
      rows.foreach {
        case (0, s, d, w) =>
          adj.getOrElseUpdate(s, new mutable.ArrayBuffer[(Long, Long)]()) += ((d, w))
        case _ => ()
      }
      val dist = new mutable.LongMap[Long]()
      var frontier = new mutable.ArrayBuffer[Long]()
      rows.foreach {
        case (1, s, _, _) =>
          if (!dist.contains(s)) { dist(s) = 0L; frontier += s }
        case _ => ()
      }
      var r = 0
      while (r < maxRounds && frontier.nonEmpty) {
        r += 1
        val improved = new mutable.LongMap[Unit]()
        frontier.foreach { u =>
          val du = dist(u)
          adj.get(u).foreach(_.foreach { case (v, w) =>
            val cand = du + w
            if (!dist.contains(v) || cand < dist(v)) {
              dist(v) = cand; improved(v) = ()
            }
          })
        }
        frontier = new mutable.ArrayBuffer[Long]()
        improved.keysIterator.foreach(frontier += _)
      }
      dist.iterator.map { case (id, d) => (id, d) }
    }.toDF("id", "dist").transform(eager)
  }

  // ------------------------------------------------------------ k-core

  /** Synchronous k-core peel — [[Graph.kCore]] verbatim (canonical
    * edges in, (id, core_degree) out, maxIter budget + throw). */
  def kCorePeel(canonicalEdges: DataFrame, k: Int, maxIter: Int): DataFrame = {
    val sp = canonicalEdges.sparkSession
    import sp.implicits._
    oneTask(canonicalEdges.select("a", "b").as[(Long, Long)]) { it =>
      var edges = it.toArray
      val live = new mutable.LongMap[Unit]()
      edges.foreach { case (a, b) => live(a) = (); live(b) = () }
      var liveCount = live.size.toLong
      var deg: mutable.LongMap[Long] = null
      var converged = false
      var iter = 0
      while (!converged && iter < maxIter) {
        val kept = edges.filter { case (a, b) =>
          live.contains(a) && live.contains(b)
        }
        deg = new mutable.LongMap[Long]()
        kept.foreach { case (a, b) =>
          deg(a) = deg.getOrElse(a, 0L) + 1L
          deg(b) = deg.getOrElse(b, 0L) + 1L
        }
        live.clear()
        deg.foreachEntry { (n, d) => if (d >= k) live(n) = () }
        val nextCount = live.size.toLong
        converged = nextCount == liveCount
        liveCount = nextCount
        edges = kept
        iter += 1
      }
      if (!converged) throw new IllegalStateException(
        s"k-core peel did not reach fixpoint in $maxIter rounds")
      deg.iterator.collect {
        case (n, d) if live.contains(n) => (n, d)
      }
    }.toDF("id", "core_degree").transform(eager)
  }

  // ----------------------------------------------------------- k-truss

  /** Synchronous k-truss peel — [[Graph.kTruss]] semantics verbatim:
    * support = triangle count within the current edge set, edges in
    * zero triangles vanish the round they occur, removed = support
    * below k−2, loop admits rounds 1..maxIter and throws beyond.
    * Input canonical (a < b) edges; output (a, b, support). */
  def kTrussPeel(canonicalEdges: DataFrame, k: Int, maxIter: Int): DataFrame = {
    val sp = canonicalEdges.sparkSession
    import sp.implicits._
    val thr = (k - 2).toLong
    oneTask(canonicalEdges.select("a", "b").as[(Long, Long)]) { it =>
      var edges = it.toArray
      // supports within the CURRENT edge set; edges in zero triangles
      // are dropped (they are absent from the map)
      def supports(es: Array[(Long, Long)]): mutable.HashMap[(Long, Long), Long] = {
        val nbr = new mutable.LongMap[mutable.TreeSet[Long]]()
        es.foreach { case (a, b) =>
          nbr.getOrElseUpdate(a, mutable.TreeSet.empty[Long]) += b
          nbr.getOrElseUpdate(b, mutable.TreeSet.empty[Long]) += a
        }
        val sup = new mutable.HashMap[(Long, Long), Long]()
        es.foreach { case (a, b) =>
          val (sm, lg) =
            if (nbr(a).size <= nbr(b).size) (nbr(a), nbr(b)) else (nbr(b), nbr(a))
          var s = 0L
          sm.foreach { c => if (c != a && c != b && lg.contains(c)) s += 1L }
          if (s > 0L) sup((a, b)) = s
        }
        sup
      }
      var live = supports(edges)
      var removedCount = live.valuesIterator.count(_ < thr).toLong
      var iter = 1
      while (removedCount > 0 && iter <= maxIter) {
        edges = live.iterator.collect {
          case ((a, b), s) if s >= thr => (a, b)
        }.toArray
        live = supports(edges)
        removedCount = live.valuesIterator.count(_ < thr).toLong
        iter += 1
      }
      if (removedCount > 0) throw new IllegalStateException(
        s"k-truss peel did not reach fixpoint in $maxIter rounds")
      live.iterator.map { case ((a, b), s) => (a, b, s) }
    }.toDF("a", "b", "support").transform(eager)
  }

  // ----------------------------------------------------------- densest

  /** Densest-subgraph peel trace — [[Graph.densestSubgraphTrace]]
    * verbatim: per round (round, n, m, m/n as double), survivors iff
    * d·n > 4·m, at most maxRounds rounds. Input canonical edges. */
  def densestTrace(canonicalEdges: DataFrame, maxRounds: Int): DataFrame = {
    val sp = canonicalEdges.sparkSession
    import sp.implicits._
    oneTask(canonicalEdges.select("a", "b").as[(Long, Long)]) { it =>
      var edges = it.toArray
      val out = new mutable.ArrayBuffer[(Long, Long, Long, Double)]()
      var r = 0L
      var live = true
      while (live && r < maxRounds) {
        val deg = new mutable.LongMap[Long]()
        edges.foreach { case (a, b) =>
          deg(a) = deg.getOrElse(a, 0L) + 1L
          deg(b) = deg.getOrElse(b, 0L) + 1L
        }
        val n = deg.size.toLong
        val m = edges.length.toLong
        if (n == 0) live = false
        else {
          out += ((r, n, m, m.toDouble / n.toDouble))
          edges = edges.filter { case (a, b) =>
            deg(a) * n > 4L * m && deg(b) * n > 4L * m
          }
          r += 1
        }
      }
      out.iterator
    }.toDF("round", "n_nodes", "n_edges", "density").transform(eager)
  }

  // -------------------------------------------------------------- HITS

  /** Fixed-point-integer HITS — [[Graph.hits]] verbatim (1e-6 fixed
    * point, max-norm with half-up integer rounding, Gauss–Seidel
    * order). Scores live on the NODE universe only (an edge endpoint
    * outside `nodes` neither carries nor relays score — exactly the
    * distributed ids-join restriction). Input: tagged rows — (0, src,
    * dst) cleaned edges, (2, id, 0) nodes. Output (id, a, h) for every
    * node. */
  def hitsScores(tagged: DataFrame, iters: Int): DataFrame = {
    val sp = tagged.sparkSession
    import sp.implicits._
    val scale = 1000000L
    oneTask(tagged.as[(Int, Long, Long)]) { it =>
      val rows = it.toArray
      val nodes = new mutable.LongMap[Unit]()
      rows.foreach { case (t, i2, _) => if (t == 2) nodes(i2) = () }
      val es = rows.collect {
        case (0, s, d) if nodes.contains(s) && nodes.contains(d) => (s, d)
      }
      val a = new mutable.LongMap[Long]()
      val h = new mutable.LongMap[Long]()
      nodes.keysIterator.foreach { n => a(n) = scale; h(n) = scale }
      def halfStep(read: mutable.LongMap[Long], alongSrc: Boolean)
          : mutable.LongMap[Long] = {
        val raw = new mutable.LongMap[Long]()
        es.foreach { case (s, d) =>
          if (alongSrc) raw(d) = raw.getOrElse(d, 0L) + read.getOrElse(s, 0L)
          else raw(s) = raw.getOrElse(s, 0L) + read.getOrElse(d, 0L)
        }
        var m = 0L
        nodes.keysIterator.foreach { n =>
          val r = raw.getOrElse(n, 0L)
          if (r > m) m = r
        }
        val out = new mutable.LongMap[Long]()
        nodes.keysIterator.foreach { n =>
          val r = raw.getOrElse(n, 0L)
          out(n) = if (r == 0L) 0L else (r * scale + m / 2L) / m
        }
        out
      }
      var ai = a
      var hi = h
      var i = 0
      while (i < iters) {
        ai = halfStep(hi, alongSrc = true)
        hi = halfStep(ai, alongSrc = false)
        i += 1
      }
      nodes.keysIterator.map(n => (n, ai(n), hi(n)))
    }.toDF("id", "a", "h").transform(eager)
  }

  // ---------------------------------------------------- labelPropagate

  /** Deterministic hard-label propagation — [[Graph.labelPropagate]]
    * verbatim: per round votes flow src ← dst, winner = max (cnt,
    * −label), label = coalesce(seed, win, previous), restricted to the
    * node universe from round 1 on (round 0 state = raw seeds). Input:
    * (0, src, dst) edges, (1, id, label) seeds, (2, id, 0) nodes.
    * Output (id, label) for labeled nodes. */
  def labelProp(tagged: DataFrame, iters: Int): DataFrame = {
    val sp = tagged.sparkSession
    import sp.implicits._
    oneTask(tagged.as[(Int, Long, Long)]) { it =>
      val rows = it.toArray
      val edges = rows.collect { case (0, s, d) => (s, d) }
      val seeds = new mutable.LongMap[Long]()
      rows.foreach { case (t, i2, l) => if (t == 1) seeds(i2) = l }
      val nodes = rows.collect { case (2, i2, _) => i2 }
      var lab: mutable.LongMap[Long] = seeds.clone()
      var round = 0
      while (round < iters) {
        // votes: dst's label votes for src
        val votes = new mutable.HashMap[(Long, Long), Long]()
        edges.foreach { case (s, d) =>
          lab.get(d).foreach { l =>
            votes((s, l)) = votes.getOrElse((s, l), 0L) + 1L
          }
        }
        // win per src: max count, tie → smallest label
        val win = new mutable.LongMap[(Long, Long)]() // src -> (cnt, label)
        votes.foreach { case ((s, l), c) =>
          win.get(s) match {
            case Some((bc, bl)) =>
              if (c > bc || (c == bc && l < bl)) win(s) = (c, l)
            case None => win(s) = (c, l)
          }
        }
        val next = new mutable.LongMap[Long]()
        nodes.foreach { id =>
          val v = seeds.get(id)
            .orElse(win.get(id).map(_._2))
            .orElse(lab.get(id))
          v.foreach(next(id) = _)
        }
        lab = next
        round += 1
      }
      lab.iterator.map { case (id, l) => (id, l) }
    }.toDF("id", "label").transform(eager)
  }

  // ---------------------------------------------------------- Luby MIS

  /** Luby MIS — [[Graph.lubyMis]] verbatim: per round the md5 priority
    * conv(substring(md5("mis:" + id + ":" + r), 1, 15), 16, 10), win iff
    * (p, id) beats every active neighbor's (p, id), winners + their
    * neighborhoods deactivate; throws past maxRounds. Input: (0, src,
    * dst) UNDIRECTED (already doubled) edges, (2, id, 0) nodes.
    * Output (id, in_mis, sel_round; −1 non-members). */
  def lubyMisLocal(tagged: DataFrame, maxRounds: Int): DataFrame = {
    val sp = tagged.sparkSession
    import sp.implicits._
    oneTask(tagged.as[(Int, Long, Long)]) { it =>
      val rows = it.toArray
      val adj = new mutable.LongMap[mutable.ArrayBuffer[Long]]()
      rows.foreach {
        case (0, s, d) =>
          adj.getOrElseUpdate(s, new mutable.ArrayBuffer[Long]()) += d
        case _ => ()
      }
      val all = rows.collect { case (2, i2, _) => i2 }.distinct
      val md = java.security.MessageDigest.getInstance("MD5")
      def prio(id: Long, r: Int): Long = {
        md.reset()
        val hex = md.digest(s"mis:$id:$r".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex.substring(0, 15), 16)
      }
      val active = new mutable.LongMap[Unit]()
      all.foreach(active(_) = ())
      val sel = new mutable.LongMap[Long]()
      var r = 1
      var done = active.isEmpty
      while (r <= maxRounds && !done) {
        val p = new mutable.LongMap[Long]()
        active.keysIterator.foreach(id => p(id) = prio(id, r))
        val win = new mutable.ArrayBuffer[Long]()
        active.keysIterator.foreach { id =>
          val pi = p(id)
          var beaten = false
          adj.get(id).foreach(_.foreach { nb =>
            if (!beaten && active.contains(nb)) {
              val pn = p(nb)
              // struct(p, id) > struct(pn, nb) must hold for EVERY
              // active neighbor; max-struct in the distributed form
              if (pn > pi || (pn == pi && nb > id)) beaten = true
            }
          })
          if (!beaten) win += id
        }
        win.foreach { id =>
          sel(id) = r.toLong
          active.remove(id)
          adj.get(id).foreach(_.foreach(active.remove))
        }
        done = active.isEmpty
        r += 1
      }
      require(done,
        s"lubyMis did not converge within $maxRounds rounds — raise maxRounds")
      all.iterator.map { id =>
        val s = sel.get(id)
        (id, s.isDefined, s.getOrElse(-1L))
      }
    }.toDF("id", "in_mis", "sel_round").transform(eager)
  }

  // ----------------------------------------------------------- Louvain

  /** Synchronous Louvain local-move sweeps — [[Graph.louvain]] /
    * louvainSweep verbatim: candidates = neighbor communities + own,
    * exact integer score S = 2m·k_vc − tot'(C)·k_v, argmax with
    * smallest-cid tiebreak (min struct(−s, cid)). Input edge list as
    * given (the caller's doubling convention defines k); m passed in.
    * Output (node, cid) for every node with an out-edge. */
  def louvainSweeps(edges: DataFrame, m: Long, rounds: Int): DataFrame = {
    val sp = edges.sparkSession
    import sp.implicits._
    oneTask(edges.select("src", "dst").as[(Long, Long)]) { it =>
      val es = it.toArray
      val k = new mutable.LongMap[Long]()
      es.foreach { case (s, _) => k(s) = k.getOrElse(s, 0L) + 1L }
      var cid = new mutable.LongMap[Long]()
      k.keysIterator.foreach(n => cid(n) = n)
      var round = 0
      while (round < rounds) {
        val tot = new mutable.LongMap[Long]()
        cid.foreachEntry { (n, c) => tot(c) = tot.getOrElse(c, 0L) + k(n) }
        // k_vc: src → (neighbor community → edge count); own community
        // is always a candidate with base 0
        val kvc = new mutable.LongMap[mutable.LongMap[Long]]()
        es.foreach { case (s, d) =>
          cid.get(d).foreach { c =>
            val m2 = kvc.getOrElseUpdate(s, new mutable.LongMap[Long]())
            m2(c) = m2.getOrElse(c, 0L) + 1L
          }
        }
        val next = new mutable.LongMap[Long]()
        cid.foreachEntry { (n, own) =>
          val kv = k(n)
          val cands = kvc.getOrElse(n, new mutable.LongMap[Long]())
          if (!cands.contains(own)) cands(own) = cands.getOrElse(own, 0L)
          var bestS = Long.MinValue
          var bestC = Long.MaxValue
          cands.foreachEntry { (c, kvcN) =>
            val totP = tot.getOrElse(c, 0L) - (if (c == own) kv else 0L)
            val s = 2L * m * kvcN - totP * kv
            if (s > bestS || (s == bestS && c < bestC)) {
              bestS = s; bestC = c
            }
          }
          next(n) = bestC
        }
        cid = next
        round += 1
      }
      cid.iterator.map { case (n, c) => (n, c) }
    }.toDF("node", "cid").transform(eager)
  }

  // ---------------------------------------------------- harmonic (exact)

  /** Hop-bounded exact harmonic centrality — [[Graph.harmonicCentrality]]
    * verbatim: BFS from every node with ≥1 out-edge, per reached node
    * accumulate count and Σ (lcm/d as exact long); final division by
    * lcm at the caller. Output (id, reached, hsum). */
  def harmonicSums(edges: DataFrame, maxHops: Int, lcm: Long): DataFrame = {
    val sp = edges.sparkSession
    import sp.implicits._
    oneTask(edges.select("src", "dst").as[(Long, Long)]) { it =>
      val es = it.toArray
      val fwd = new mutable.LongMap[mutable.ArrayBuffer[Long]]()
      es.foreach { case (s, d) =>
        fwd.getOrElseUpdate(s, new mutable.ArrayBuffer[Long]()) += d
      }
      val reached = new mutable.LongMap[Long]()
      val hsum = new mutable.LongMap[Long]()
      val dist = new mutable.LongMap[Int]()
      fwd.keysIterator.foreach { s =>
        dist.clear()
        dist(s) = 0
        var frontier = List(s)
        var h = 1
        while (h <= maxHops && frontier.nonEmpty) {
          val next = new mutable.ArrayBuffer[Long]()
          frontier.foreach { u =>
            fwd.get(u).foreach(_.foreach { v =>
              if (!dist.contains(v)) { dist(v) = h; next += v }
            })
          }
          // credit v with 1/h from source s (exact long: h divides lcm)
          next.foreach { v =>
            reached(v) = reached.getOrElse(v, 0L) + 1L
            hsum(v) = hsum.getOrElse(v, 0L) + (lcm.toDouble / h).toLong
          }
          frontier = next.toList
          h += 1
        }
      }
      reached.keysIterator.map(v => (v, reached(v), hsum(v)))
    }.toDF("id", "reached", "hsum").transform(eager)
  }
}
