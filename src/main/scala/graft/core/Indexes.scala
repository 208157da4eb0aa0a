package graft.core

/** Catalog entry for one secondary index (ANN signature table, IVF cell
  * partition, PQ code table, …) — the lifecycle record that makes an index a
  * first-class catalog object instead of a side effect of the first probe.
  *
  * The reference's only catalog is the collection map
  * (`/root/reference/database/database.go:29`); indexes are this engine's
  * extension, so their lifecycle mirrors the collection contract: driver-side
  * metadata in a manifest, immutable versioned data directories, copy-on-write
  * rebuilds that swap a pointer.
  *
  * @param name        unique index id within the database
  * @param kind        builder family ("lsh-band", "ivf-cell", "pq-codes",
  *                    "ivf-trained") — informational + definition-match guard
  * @param sourcePath  the corpus parquet path the index was built from
  * @param params      build parameters (bits/bands/nCells/…); a probe whose
  *                    requested params differ from the stored ones must NOT be
  *                    served this index (see [[GraftDatabase.resolveIndex]])
  * @param path        the index data directory of the CURRENT version
  * @param fingerprint [[GraftDatabase.sourceFingerprint]] of `sourcePath`
  *                    captured when the build started — the staleness token
  * @param version     bumped on every rebuild (copy-on-write dir per version)
  */
final case class IndexMeta(
    name: String,
    kind: String,
    sourcePath: String,
    params: Map[String, String],
    path: String,
    fingerprint: String,
    version: Int)

/** What a probe may do when the index it wants is missing or stale.
  *
  * The round-7 hazard this encodes away: an index build as a silent side
  * effect of the first probe is a full corpus rewrite triggered by a read-only
  * query, into a location the catalog doesn't know about. Every probe now
  * states its policy; only `RebuildIfStale` may ever rewrite over live data,
  * and both build-capable policies register what they built in the manifest.
  */
sealed abstract class IndexPolicy
object IndexPolicy {

  /** Probe-only: error if the index is absent, stale, or built under a
    * different definition. The production default — builds belong to an
    * orchestrated [[GraftDatabase.buildIndex]] step, not the query path. */
  case object FailIfMissing extends IndexPolicy

  /** Build when absent (first-touch convenience for immutable sources);
    * still error when STALE or DEFINITION-MISMATCHED — silently rewriting
    * an existing index from a read path is the one thing a probe must
    * never do (two probes with different definitions would ping-pong full
    * corpus rebuilds against each other). */
  case object BuildIfMissing extends IndexPolicy

  /** Build when absent, stale, or definition-mismatched — the explicit
    * "refresh as needed" mode for maintenance jobs, and the only policy
    * allowed to replace live index data. */
  case object RebuildIfStale extends IndexPolicy
}
