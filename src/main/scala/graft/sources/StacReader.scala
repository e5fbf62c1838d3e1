package graft.sources

import java.nio.file.{Files, Paths, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** readers.stac analog (io/StacReader.cpp:110, option surface :126-151):
  * resolve a STAC catalog to its matching items' data assets and read
  * them as one view.
  *
  * Selection mirrors the reference: `bounds` prunes items by their bbox
  * BEFORE any data file is opened (:246-250 + the item-level bbox gate),
  * `item_ids` / `catalog_ids` are regexes over item/catalog ids
  * (:135-136), `properties` is a map of property name -> regex that all
  * must match (:140-142), and `asset_names` picks the first present
  * asset per item in the given order (default `data`, :130). Catalog
  * traversal follows `child` links recursively and `item` links at every
  * level, with hrefs resolved relative to the containing JSON (local
  * paths only — the sandbox has no network; the reference fetches http
  * through its arbiter the same way).
  *
  * Scale shape: catalog metadata is tiny and parses on the driver (one
  * JSON fetch per node, same as the reference); the DATA reads are
  * ordinary Spark source scans unioned with unionByName, so partition
  * pruning / pushdown on each child reader is untouched, and pruned
  * items cost zero I/O — this is TIndex-style manifest pruning driven by
  * a public catalog format instead of a private manifest table. */
object StacReader {

  final case class Item(id: String, bbox: Option[(Double, Double, Double, Double)],
      properties: Map[String, String], assets: Map[String, String])

  def read(spark: SparkSession, catalogPath: String,
      bounds: Option[(Double, Double, Double, Double)] = None,
      itemIds: Seq[String] = Nil, catalogIds: Seq[String] = Nil,
      assetNames: Seq[String] = Seq("data"),
      properties: Map[String, String] = Map.empty): DataFrame = {
    val items = collectItems(catalogPath, catalogIds)
    val selected = items.filter { it =>
      val boxOk = (bounds, it.bbox) match {
        case (Some((qx0, qy0, qx1, qy1)), Some((x0, y0, x1, y1))) =>
          x0 <= qx1 && x1 >= qx0 && y0 <= qy1 && y1 >= qy0
        case _ => true // no bounds, or item without bbox: not prunable
      }
      val idOk = itemIds.isEmpty || itemIds.exists(p => it.id.matches(p))
      val propOk = properties.forall { case (k, p) =>
        it.properties.get(k).exists(_.matches(p))
      }
      boxOk && idOk && propOk
    }
    require(selected.nonEmpty,
      s"readers.stac: no item of ${items.length} matches the selection")
    val parts = selected.map { it =>
      val href = assetNames.iterator.flatMap(it.assets.get).nextOption()
        .getOrElse(throw new IllegalArgumentException(
          s"readers.stac: item '${it.id}' has none of assets " +
          s"${assetNames.mkString(", ")} (has: ${it.assets.keys.mkString(", ")})"))
      readAsset(spark, href)
    }
    val union = parts.reduce(_.unionByName(_, allowMissingColumns = true))
    bounds match { // bounds propagate into the point filter like :133-134
      // both coordinate columns must exist — an x-only schema would make
      // the y reference an unresolved-column crash instead of a skip
      case Some((x0, y0, x1, y1))
          if union.columns.contains("x") && union.columns.contains("y") =>
        union.filter(col("x") >= x0 && col("x") <= x1 &&
          col("y") >= y0 && col("y") <= y1)
      case _ => union
    }
  }

  /** Depth-first catalog walk. `catalog_ids` prunes SUB-catalog subtrees
    * (the root is always entered, like the reference which has already
    * opened it to know its type). `visited` (normalized absolute paths)
    * makes the walk DAG/cycle-safe: a node reachable by two parents is
    * read once (reading it twice would duplicate its items' data), and a
    * self- or mutually-referencing catalog terminates instead of
    * overflowing the stack. */
  private def collectItems(path: String, catalogIds: Seq[String],
      isRoot: Boolean = true,
      visited: scala.collection.mutable.Set[String] =
        scala.collection.mutable.Set.empty): Seq[Item] = {
    val p = Paths.get(path)
    if (!visited.add(p.toAbsolutePath.normalize().toString)) return Nil
    val json = JsonMethods.parse(Files.readString(p))
    def str(v: JValue): Option[String] =
      v match { case JString(s) => Some(s); case _ => None }
    val typ = str(json \ "type").getOrElse("")
    typ match {
      case "Feature" => Seq(parseItem(json, p))
      case "Catalog" | "Collection" =>
        val id = str(json \ "id").getOrElse("")
        if (!isRoot && catalogIds.nonEmpty && !catalogIds.exists(id.matches(_)))
          Nil
        else json \ "links" match {
          case JArray(links) => links.flatMap { l =>
            (str(l \ "rel"), str(l \ "href")) match {
              case (Some(rel), Some(href)) if rel == "child" || rel == "item" =>
                collectItems(resolve(p, href), catalogIds, isRoot = false,
                  visited = visited)
              case _ => Nil
            }
          }
          case _ => Nil
        }
      case other => throw new IllegalArgumentException(
        s"readers.stac: unsupported STAC type '$other' at $path")
    }
  }

  private def parseItem(json: JValue, at: Path): Item = {
    def str(v: JValue): Option[String] =
      v match { case JString(s) => Some(s); case _ => None }
    val id = str(json \ "id").getOrElse(
      throw new IllegalArgumentException(s"readers.stac: item without id at $at"))
    val bbox = json \ "bbox" match {
      case JArray(ns) if ns.length >= 4 =>
        val d = ns.map {
          case JDouble(x) => x; case JInt(x) => x.toDouble
          case JLong(x) => x.toDouble
          case other => throw new IllegalArgumentException(
            s"readers.stac: bad bbox element $other in item '$id'")
        }
        // 2D [x0,y0,x1,y1] or 3D [x0,y0,z0,x1,y1,z1]
        if (ns.length >= 6) Some((d(0), d(1), d(3), d(4)))
        else Some((d(0), d(1), d(2), d(3)))
      case _ => None
    }
    val props = json \ "properties" match {
      case JObject(fs) => fs.collect {
        case (k, JString(s)) => k -> s
        case (k, JDouble(x)) => k -> x.toString
        case (k, JInt(x)) => k -> x.toString
        case (k, JLong(x)) => k -> x.toString
        case (k, JBool(b)) => k -> b.toString
      }.toMap
      case _ => Map.empty[String, String]
    }
    val assets = json \ "assets" match {
      case JObject(fs) => fs.flatMap { case (name, a) =>
        str(a \ "href").map(h => name -> resolve(at, h))
      }.toMap
      case _ => Map.empty[String, String]
    }
    Item(id, bbox, props, assets)
  }

  private def resolve(relativeTo: Path, href: String): String =
    if (href.startsWith("/")) href
    else relativeTo.getParent.resolve(href).normalize().toString

  /** Dispatch an asset href to a reader by extension — the analog of the
    * reference's driver inference + readerArgs (:282-296, :440). */
  private def readAsset(spark: SparkSession, href: String): DataFrame =
    href.takeRight(href.length - href.lastIndexOf('.') - 1).toLowerCase match {
      case "parquet" => spark.read.parquet(href)
      case "csv" | "txt" =>
        spark.read.option("header", "true").option("inferSchema", "true").csv(href)
      case "ply" => PlyReader.readAscii(spark, href)._1
      case other => throw new IllegalArgumentException(
        s"readers.stac: no reader for asset extension '.$other' ($href)")
    }
}
