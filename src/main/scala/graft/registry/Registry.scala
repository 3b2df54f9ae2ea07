package graft.registry

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Indexer lifecycle state machines — the reference's enums verbatim
  * (/root/reference hbase-indexer-model .../IndexerDefinition.java:248-325):
  * clients request transitions by flag-flip; the supervisor executes them.
  */
sealed abstract class LifecycleState(val name: String)
object LifecycleState {
  case object Active extends LifecycleState("ACTIVE")
  case object DeleteRequested extends LifecycleState("DELETE_REQUESTED")
  case object Deleting extends LifecycleState("DELETING")
  case object DeleteFailed extends LifecycleState("DELETE_FAILED")
  val all = Seq(Active, DeleteRequested, Deleting, DeleteFailed)
  def parse(s: String): LifecycleState = all.find(_.name == s)
    .getOrElse(throw new IllegalArgumentException(s"lifecycle state: $s"))
}

sealed abstract class IncrementalIndexingState(val name: String)
object IncrementalIndexingState {
  case object SubscribeAndConsume extends IncrementalIndexingState("SUBSCRIBE_AND_CONSUME")
  case object SubscribeDoNotConsume extends IncrementalIndexingState("SUBSCRIBE_DO_NOT_CONSUME")
  case object DoNotSubscribe extends IncrementalIndexingState("DO_NOT_SUBSCRIBE")
  val all = Seq(SubscribeAndConsume, SubscribeDoNotConsume, DoNotSubscribe)
  def parse(s: String): IncrementalIndexingState = all.find(_.name == s)
    .getOrElse(throw new IllegalArgumentException(s"incremental state: $s"))
}

sealed abstract class BatchIndexingState(val name: String)
object BatchIndexingState {
  case object Inactive extends BatchIndexingState("INACTIVE")
  case object BuildRequested extends BatchIndexingState("BUILD_REQUESTED")
  case object Building extends BatchIndexingState("BUILDING")
  val all = Seq(Inactive, BuildRequested, Building)
  def parse(s: String): BatchIndexingState = all.find(_.name == s)
    .getOrElse(throw new IllegalArgumentException(s"batch state: $s"))
}

/** An indexer definition — name, opaque mapping config, the three state
  * machines, subscription timestamp, and the OCC version
  * (IndexerDefinition.java:68-133). */
case class IndexerDefinition(
    name: String,
    configXml: String,
    lifecycleState: LifecycleState = LifecycleState.Active,
    incrementalState: IncrementalIndexingState = IncrementalIndexingState.SubscribeAndConsume,
    batchState: BatchIndexingState = BatchIndexingState.Inactive,
    subscriptionTimestamp: Long = 0L,
    occVersion: Long = 0L)

class ConcurrentModificationError(msg: String) extends RuntimeException(msg)

/** C1: definition catalog with optimistic concurrency and change
  * listeners — the reference keeps these as JSON in ZooKeeper with
  * watchers (IndexerModelImpl.java:159-530); one driver JVM needs only a
  * directory of JSON files and in-process listeners. The OCC contract is
  * identical: an update must carry the current occVersion or it fails. */
class IndexerRegistry(dirPath: String) {
  private val dir: Path = Paths.get(dirPath)
  Files.createDirectories(dir)
  private val listeners = new java.util.concurrent.CopyOnWriteArrayList[String => Unit]()

  private def file(name: String): Path = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"invalid indexer name: $name")
    dir.resolve(s"$name.json")
  }

  def onChange(listener: String => Unit): Unit = listeners.add(listener)
  private def notifyChanged(name: String): Unit = listeners.asScala.foreach(_(name))

  // -- JSON serde (IndexerDefinitionJsonSerDeser equivalent) --------------

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def toJson(d: IndexerDefinition): String =
    s"""{"name": "${esc(d.name)}", "configXml": "${esc(d.configXml)}",
       | "lifecycleState": "${d.lifecycleState.name}",
       | "incrementalState": "${d.incrementalState.name}",
       | "batchState": "${d.batchState.name}",
       | "subscriptionTimestamp": ${d.subscriptionTimestamp},
       | "occVersion": ${d.occVersion}}""".stripMargin

  def fromJson(json: String): IndexerDefinition = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    IndexerDefinition(
      name = (j \ "name").extract[String],
      configXml = (j \ "configXml").extract[String],
      lifecycleState = LifecycleState.parse((j \ "lifecycleState").extract[String]),
      incrementalState = IncrementalIndexingState.parse((j \ "incrementalState").extract[String]),
      batchState = BatchIndexingState.parse((j \ "batchState").extract[String]),
      subscriptionTimestamp = (j \ "subscriptionTimestamp").extract[Long],
      occVersion = (j \ "occVersion").extract[Long])
  }

  // -- CRUD with OCC ------------------------------------------------------

  /** Name rules are the reference's IndexerNameValidator.java:38-45
    * verbatim: non-empty, `^\w+$` (word characters only — stricter than
    * the path-safety check, since names travel into subscription ids and
    * metric names). */
  def validateName(name: String): Unit = {
    if (name == null || name.isEmpty)
      throw new IllegalArgumentException("Indexer name may not be empty")
    if (!name.matches("^\\w+$"))
      throw new IllegalArgumentException(
        s"Invalid indexer name '$name', must be alpha-numeric")
  }

  def add(d: IndexerDefinition): IndexerDefinition = synchronized {
    validateName(d.name)
    val f = file(d.name)
    if (Files.exists(f))
      throw new IllegalStateException(s"indexer exists: ${d.name}")
    val stored = d.copy(occVersion = 0L)
    Files.writeString(f, toJson(stored))
    notifyChanged(d.name)
    stored
  }

  def get(name: String): Option[IndexerDefinition] = synchronized {
    val f = file(name)
    if (Files.exists(f)) Some(fromJson(Files.readString(f))) else None
  }

  def list(): Seq[IndexerDefinition] = synchronized {
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".json"))
      .map(p => fromJson(Files.readString(p)))
      .toSeq.sortBy(_.name)
    finally s.close()
  }

  /** OCC update: `d.occVersion` must equal the stored version; the stored
    * definition gets version+1 (IndexerModelImpl.java:265-328). */
  def update(d: IndexerDefinition): IndexerDefinition = synchronized {
    val current = get(d.name)
      .getOrElse(throw new IllegalStateException(s"no such indexer: ${d.name}"))
    if (current.occVersion != d.occVersion)
      throw new ConcurrentModificationError(
        s"${d.name}: expected occVersion ${current.occVersion}, got ${d.occVersion}")
    val stored = d.copy(occVersion = d.occVersion + 1)
    Files.writeString(file(d.name), toJson(stored))
    notifyChanged(d.name)
    stored
  }

  /** C2: clients request deletion by flag-flip; the supervisor executes. */
  def requestDelete(name: String): IndexerDefinition = synchronized {
    val d = get(name).getOrElse(throw new IllegalStateException(s"no such indexer: $name"))
    update(d.copy(lifecycleState = LifecycleState.DeleteRequested))
  }

  /** Physical removal — supervisor-only, after DELETE_REQUESTED. */
  private[registry] def remove(name: String): Unit = synchronized {
    Files.deleteIfExists(file(name))
    notifyChanged(name)
  }
}
