package graft.core

import org.apache.spark.sql.DataFrame

/** The ONE place the engine materializes an intermediate frame — every
  * `localCheckpoint` call site routes through here so the cluster-semantics
  * caveat lives in a single source of truth instead of being re-derived
  * (or silently relied on) at each site.
  *
  * Why localCheckpoint and not persist: `persist` caches DATA but the
  * logical plan still nests — a frame referenced twice keeps a plan branch
  * per reference, and inside an iterative loop the plan tree DOUBLES every
  * round (exponential growth that OOMs plan stringification after ~8
  * rounds; first hit in Dedup.connectedComponents). `localCheckpoint`
  * truncates the lineage: the returned frame's plan is a scan of the
  * materialized blocks, so (a) a twice-referenced stage executes ONCE, and
  * (b) loop plans keep constant depth.
  *
  * Cluster caveat (the 100-TB fine print): localCheckpoint stores blocks
  * on EXECUTOR-LOCAL storage (memory, spilling to local disk) with the
  * lineage discarded — if an executor is lost, its blocks are gone and the
  * job FAILS instead of recomputing. That trade is right for this engine's
  * uses (bounded intermediate stages inside one job, where the alternative
  * is a multiplicative re-scan of the corpus), and on a long-running
  * cluster with executor churn the same call sites should switch to
  * reliable `checkpoint()` (same shape, blocks on the cluster FS) by
  * setting `spark.sparkContext.setCheckpointDir` and flipping
  * [[reliable]]. Eagerness is deliberate: the stage runs NOW, so a later
  * stage re-referencing it reads blocks, never re-executes — and the
  * barrier also stops Catalyst from fusing interpreted HOF pyramids across
  * stage boundaries (see Curation's signal branches).
  */
object Materialize {

  /** Session-scoped switch: when true, [[stage]] uses reliable
    * `checkpoint()` (requires `setCheckpointDir`); default is
    * executor-local. Flip once at session setup on clusters where executor
    * loss must not fail the job. */
  @volatile var reliable: Boolean = false

  /** Materialize `df` eagerly and return a lineage-truncated frame over
    * the stored blocks. See the object scaladoc for when (and when not)
    * this is safe at cluster scale. */
  def stage(df: DataFrame): DataFrame =
    if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)

  /** Chainable syntax: `df.select(...).staged` — import Materialize._ */
  implicit final class StageSyntax(private val df: DataFrame) extends AnyVal {
    def staged: DataFrame = stage(df)
  }
}

