package graft.core

import graft.conf.IndexerConf
import graft.model.{DocOp, MutationEvent}
import org.apache.spark.sql.{DataFrame, Dataset}

/** P17: the custom-mapper plug-in seam — the reference's `mapper=` escape
  * hatch (`ResultToSolrMapper.java:27-67`, loaded reflectively by
  * `ResultToSolrMapperFactory` and configured via `ConfigureUtil.configure
  * (params)`). A mapper replaces the whole declarative mapping stage with
  * a pure function `MutationEvent => Seq[DocOp]`, run as a typed
  * `Dataset.flatMap` — one event in, N doc-ops out (the engine's
  * UDTF-equivalent). Everything downstream (dedup already ran upstream,
  * sink algebra) is unchanged. */
trait RecordMapper extends Serializable {
  /** Called once per executor instance with the conf's `<param>` map
    * (reference Configurable.configure, ConfigureUtil.java:25-31). */
  def configure(params: Map[String, String]): Unit = ()
  def map(event: MutationEvent): Seq[DocOp]
}

object CustomMapper {

  /** Reflective load + configure, as the reference factory does. */
  def load(conf: IndexerConf): RecordMapper = {
    val cls = conf.mapperClass.getOrElse(
      throw new IllegalArgumentException("conf has no mapper= attribute"))
    val m = Class.forName(cls).getDeclaredConstructor().newInstance()
      .asInstanceOf[RecordMapper]
    m.configure(conf.params)
    m
  }

  /** events → doc ops through the plug-in mapper. The table filter and
    * last-wins dedup still run first (they are engine semantics, not
    * mapping semantics — the reference dedups before mapping too,
    * Indexer.java:297-321). */
  def run(conf: IndexerConf)(events: DataFrame): Dataset[DocOp] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val mapper = load(conf)
    val deduped = IndexerCore.tableFilter(conf)(events)
      .groupBy(col("rowKey"))
      .agg(max_by(struct(IndexerCore.eventCols.map(col): _*), col("seq")).as("e"))
      .select(col("e.*"))
    deduped.as[MutationEvent].flatMap(mapper.map(_))
  }
}

/** Demo plug-in (the tests' and queries' stand-in for a user-provided
  * class): emits one doc per event with every cell value uppercased into
  * `<qualifier><suffix>`, id = rowKey. */
class UppercaseMapper extends RecordMapper {
  private var suffix = "_u"
  override def configure(params: Map[String, String]): Unit =
    suffix = params.getOrElse("suffix", "_u")
  override def map(event: MutationEvent): Seq[DocOp] = Seq(
    DocOp(
      kind = DocOp.Add,
      id = event.rowKey,
      doc = event.cells.filter(_.cellType == "put")
        .groupBy(_.qualifier + suffix)
        .view.mapValues(_.sortBy(_.qualifier).map(c => Option(c.value).fold("")(_.toUpperCase)))
        .toMap,
      queryRow = None,
      queryFamily = None))
}
