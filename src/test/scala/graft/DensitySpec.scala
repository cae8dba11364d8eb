package graft

import graft.sim.Density

class DensitySpec extends SparkSpec {
  import spark.implicits._

  test("dbscan: two blobs, a border point, coincident points, and noise") {
    // eps=1.0, minPts=5 (point counts itself).
    // Blob A (ids 1-5): pairwise dists ≤ √0.5 — every point sees the other
    // 4 → core; cluster label = min core id = 1.
    // id 6 at (1.2, 0): within eps of exactly 3 blob-A points (0.5,0),
    // (0.5,0.5), (0.25,0.25) → 3+1 < 5, not core, but core neighbours
    // exist → border of cluster 1. It also lives in grid cell (1,0) while
    // the blob sits in cell (0,0) — the adjacent-cell probe must find it.
    // id 7 far away → noise.
    // Blob B (ids 8-12): same shape at (20,20) → cores, cluster 8.
    // ids 13-15 coincident at (30,30): each sees 2 others → not core, no
    // core neighbour → noise (coincident points must not double-count).
    val blob = Seq((0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (0.5, 0.5), (0.25, 0.25))
    val pts =
      blob.zipWithIndex.map { case ((x, y), i) => (i + 1L, x, y) } ++
        Seq((6L, 1.2, 0.0), (7L, 10.0, 10.0)) ++
        blob.zipWithIndex.map { case ((x, y), i) => (i + 8L, x + 20, y + 20) } ++
        Seq((13L, 30.0, 30.0), (14L, 30.0, 30.0), (15L, 30.0, 30.0))
    val got = Density
      .dbscan(pts.toDF("id", "x", "y"), "id", "x", "y", eps = 1.0, minPts = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val expect =
      (1L to 5L).map(_ -> ("core", Some(1L))).toMap ++
        Map(6L -> ("border", Some(1L)), 7L -> ("noise", None)) ++
        (8L to 12L).map(_ -> ("core", Some(8L))).toMap ++
        (13L to 15L).map(_ -> ("noise", None)).toMap
    assert(got == expect)
  }

  test("dbscan: border point between two clusters attaches to the smaller label") {
    // Two 5-point blobs centred at x=0.7 and x=3.3; with eps=1.1 the
    // midpoint id 20 at (2.0, 0) is within eps of exactly ONE core per
    // blob (dist 1.0 to each blob's inner point; every other blob point
    // is ≥ 1.3 away) → 2+1 < 5, border of BOTH clusters — the classic
    // ambiguity; the documented tiebreak is the smallest cluster label.
    def blobAt(x0: Double, base: Long) = Seq(
      (base, x0, 0.0), (base + 1, x0 + 0.3, 0.0), (base + 2, x0 - 0.3, 0.0),
      (base + 3, x0, 0.3), (base + 4, x0, -0.3))
    val pts = blobAt(0.7, 1L) ++ blobAt(3.3, 11L) ++ Seq((20L, 2.0, 0.0))
    val got = Density
      .dbscan(pts.toDF("id", "x", "y"), "id", "x", "y", eps = 1.1, minPts = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(20L) == ("border", Some(1L)))
    assert(got(1L) == ("core", Some(1L)) && got(11L) == ("core", Some(11L)))
  }
}
