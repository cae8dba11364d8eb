package graft.sources

import graft.api.Node
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType, StructField}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Per-row file operations — the reference's FileReader/FileWriter/
  * FileMover/FileCleaner nodes (pypeman/nodes.py:619-749) and the FTP file
  * nodes (contrib/ftp.py, over a mounted/staged transfer directory).
  *
  * pypeman reads one file per message on the event loop; here each
  * executor partition does its own I/O (`mapPartitions`), so a million-file
  * ingest spreads across the cluster. Paths must be on storage all
  * executors see (shared FS / fuse mount / NFS) — same contract as any
  * distributed read.
  *
  * For whole-directory ingest prefer the declarative sources
  * (`spark.read.format("binaryFile")`, `text`, `csv`…) — these nodes are
  * for the reference's "path arrives in message meta" pattern.
  */
object FileNodes {

  /** FileReader: load each row's `pathCol` file into `payload`. */
  def fileReader(pathCol: String = "filepath", binary: Boolean = false): Node =
    Node(s"FileReader($pathCol)") { df =>
      val schema = org.apache.spark.sql.types.StructType(
        df.schema.fields :+
          StructField("payload", if (binary) BinaryType else StringType))
      val pathIdx = df.schema.fieldIndex(pathCol)
      df.sparkSession.createDataFrame(
        df.rdd.mapPartitions { rows =>
          rows.map { r =>
            val bytes = Files.readAllBytes(Paths.get(r.getString(pathIdx)))
            val payload: Any =
              if (binary) bytes else new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            Row.fromSeq(r.toSeq :+ payload)
          }
        }, schema)
    }

  /** FileWriter: write each row's payload to its `pathCol`; safe-file
    * semantics (write .tmp then atomic rename) as in the reference. */
  def fileWriter(pathCol: String = "filepath", payloadCol: String = "payload",
      safeFile: Boolean = true, validExtension: Option[String] = None): Node =
    Node(s"FileWriter($pathCol)") { df =>
      val pIdx = df.schema.fieldIndex(pathCol)
      val cIdx = df.schema.fieldIndex(payloadCol)
      df.rdd.foreachPartition { rows =>
        rows.foreach { r =>
          val dest = Paths.get(r.getString(pIdx))
          Option(dest.getParent).foreach(Files.createDirectories(_))
          val bytes = r.get(cIdx) match {
            case b: Array[Byte] => b
            case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            case other => String.valueOf(other).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          if (safeFile) {
            val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmp")
            Files.write(tmp, bytes)
            Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
          } else Files.write(dest, bytes)
          validExtension.foreach { ext =>
            Files.write(Paths.get(dest.toString.replaceAll("\\.[^.]+$", "") + ext),
              Array.empty[Byte])
          }
        }
      }
      df
    }

  /** FileMover: move each row's file into destDir, update the path column. */
  def fileMover(destDir: String, pathCol: String = "filepath"): Node =
    Node(s"FileMover($destDir)") { df =>
      val moved = udfFreeMove(df, pathCol, destDir)
      moved
    }

  private def udfFreeMove(df: DataFrame, pathCol: String, destDir: String): DataFrame = {
    val pIdx = df.schema.fieldIndex(pathCol)
    val schema = df.schema
    df.sparkSession.createDataFrame(
      df.rdd.mapPartitions { rows =>
        Files.createDirectories(Paths.get(destDir))
        rows.map { r =>
          val src = Paths.get(r.getString(pIdx))
          val dst = Paths.get(destDir).resolve(src.getFileName)
          Files.move(src, dst, StandardCopyOption.REPLACE_EXISTING)
          Row.fromSeq(r.toSeq.updated(pIdx, dst.toString))
        }
      }, schema)
  }

  /** FileCleaner: delete each row's file plus sibling metafiles with the
    * given extensions (e.g. ".ok"). */
  def fileCleaner(pathCol: String = "filepath", extensionsToRm: Seq[String] = Nil): Node =
    Node("FileCleaner") { df =>
      val pIdx = df.schema.fieldIndex(pathCol)
      df.rdd.foreachPartition { rows =>
        rows.foreach { r =>
          val f = Paths.get(r.getString(pIdx))
          Files.deleteIfExists(f)
          extensionsToRm.foreach { ext =>
            Files.deleteIfExists(
              f.resolveSibling(f.getFileName.toString.replaceAll("\\.[^.]+$", "") + ext))
          }
        }
      }
      df
    }
}
