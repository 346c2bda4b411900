package graft

import graft.streaming.LocalCheckpointFileManager
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the java.nio checkpoint file manager: the
  * atomic-rename semantics HDFSMetadataLog and the state stores rely
  * on (r15 — the manager replaces Hadoop's FileContext layer on local
  * checkpoint trees). */
class LocalCheckpointFileManagerSpec extends AnyFunSuite {
  private def withMgr(f: (LocalCheckpointFileManager, java.nio.file.Path) => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("cfm_spec")
    try f(new LocalCheckpointFileManager(
      new Path(dir.toUri), new Configuration()), dir)
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("createAtomic publishes on close, leaves no temp litter") {
    withMgr { (m, dir) =>
      val p = new Path(dir.toUri.getPath, "offsets/0")
      m.mkdirs(new Path(dir.toUri.getPath, "offsets"))
      val out = m.createAtomic(p, overwriteIfPossible = false)
      out.write("v1\n{}".getBytes)
      assert(!m.exists(p)) // invisible until close
      out.close()
      assert(m.exists(p))
      val in = m.open(p)
      val buf = new Array[Byte](64)
      val n = in.read(buf); in.close()
      assert(new String(buf, 0, n) == "v1\n{}")
      assert(m.list(new Path(dir.toUri.getPath, "offsets")).length == 1)
    }
  }

  test("no-overwrite collision throws hadoop FileAlreadyExistsException") {
    withMgr { (m, dir) =>
      val p = new Path(dir.toUri.getPath, "commits/0")
      m.mkdirs(new Path(dir.toUri.getPath, "commits"))
      val a = m.createAtomic(p, overwriteIfPossible = false)
      a.write("first".getBytes); a.close()
      val b = m.createAtomic(p, overwriteIfPossible = false)
      b.write("second".getBytes)
      intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { b.close() }
      // loser's temp file cleaned up; winner's content intact
      assert(m.list(new Path(dir.toUri.getPath, "commits")).length == 1)
      val in = m.open(p); val buf = new Array[Byte](16)
      val n = in.read(buf); in.close()
      assert(new String(buf, 0, n) == "first")
      // overwriteIfPossible = true replaces
      val c = m.createAtomic(p, overwriteIfPossible = true)
      c.write("third".getBytes); c.close()
      val in2 = m.open(p); val n2 = in2.read(buf); in2.close()
      assert(new String(buf, 0, n2) == "third")
    }
  }

  test("cancel discards; open of missing file is FileNotFound; delete is idempotent") {
    withMgr { (m, dir) =>
      val p = new Path(dir.toUri.getPath, "state/1.delta")
      m.mkdirs(new Path(dir.toUri.getPath, "state"))
      val out = m.createAtomic(p, overwriteIfPossible = true)
      out.write("junk".getBytes); out.cancel()
      assert(!m.exists(p))
      assert(m.list(new Path(dir.toUri.getPath, "state")).isEmpty)
      intercept[java.io.FileNotFoundException] { m.open(p) }
      m.delete(p) // no-op, must not throw
      m.delete(new Path(dir.toUri.getPath, "state"))
      assert(!m.exists(new Path(dir.toUri.getPath, "state")))
    }
  }

  test("seek/getPos surface for the metadata-log reader") {
    withMgr { (m, dir) =>
      val p = new Path(dir.toUri.getPath, "f")
      val out = m.createAtomic(p, overwriteIfPossible = false)
      out.write("0123456789".getBytes); out.close()
      val in = m.open(p)
      in.seek(4)
      assert(in.getPos == 4 && in.read() == '4'.toInt)
      val buf = new Array[Byte](3)
      in.readFully(7, buf)
      assert(new String(buf) == "789" && in.getPos == 5) // pread preserves pos
      in.close()
    }
  }
}
