package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.io.File
import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Boots a private unix-socket PostgreSQL cluster for one suite — initdb'd
  * fresh, run as `nobody` (Postgres refuses root), torn down in afterAll.
  * Cancels (not fails) every test when server binaries are unavailable.
  * Shared by the dialect-SQL spec and the COPY-store lifecycle spec. */
trait PostgresCluster extends AnyFunSuite with BeforeAndAfterAll {

  protected val pgBin: Option[String] =
    Seq("/usr/local/bin", "/usr/lib/postgresql/15/bin")
      .find(d => new File(d, "initdb").exists && new File(d, "pg_ctl").exists)

  protected var pgRoot: String = _
  private var started = false

  protected def asNobody(cmd: String): (Int, String) = {
    val out = new StringBuilder
    val logger = ProcessLogger(l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    val rc = Process(Seq("su", "-s", "/bin/sh", "nobody", "-c", cmd), new File("/tmp")) ! logger
    (rc, out.toString)
  }

  /** Run SQL via psql; returns unaligned tuples-only output. Fails the
    * calling test on a non-zero exit (syntax errors surface loudly). */
  protected def psql(sql: String, db: String = "graft"): String = {
    val f = Files.createTempFile(Paths.get(pgRoot), "stmt", ".sql")
    Files.writeString(f, sql)
    f.toFile.setReadable(true, false)
    val (rc, out) = asNobody(
      s"psql -h $pgRoot/sock -U graft -d $db -v ON_ERROR_STOP=1 -tA -f $f")
    Files.delete(f)
    assert(rc == 0, s"psql failed (rc=$rc):\n$sql\n--- output ---\n$out")
    out.trim
  }

  /** A [[PsqlRunner]] over this suite's cluster (graft db, nobody user). */
  protected def psqlRunner: PsqlRunner = new PsqlRunner {
    def runFile(path: String): (Int, String) =
      asNobody(s"psql -h $pgRoot/sock -U graft -d graft -v ON_ERROR_STOP=1 -tA -f $path")
  }

  override def beforeAll(): Unit = {
    assume(pgBin.isDefined, "postgres server binaries not available")
    val bin = pgBin.get
    pgRoot = Files.createTempDirectory("graft_pg").toString
    // Postgres refuses to run as root; hand the cluster dir to nobody.
    new File(pgRoot).setReadable(true, false)
    new File(pgRoot).setWritable(true, false)
    new File(pgRoot).setExecutable(true, false)
    Files.createDirectories(Paths.get(s"$pgRoot/sock"))
    Process(Seq("chown", "-R", "nobody", pgRoot)).!
    val (rcInit, outInit) =
      asNobody(s"$bin/initdb -D $pgRoot/data -U graft -A trust --no-sync")
    assume(rcInit == 0, s"initdb failed:\n$outInit")
    val (rcStart, outStart) = asNobody(
      s"""$bin/pg_ctl -D $pgRoot/data -l $pgRoot/log -o "-c listen_addresses='' -k $pgRoot/sock" -w start""")
    assume(rcStart == 0, s"pg_ctl start failed:\n$outStart")
    started = true
    psql("CREATE DATABASE graft", db = "postgres")
  }

  override def afterAll(): Unit = {
    if (started) asNobody(s"${pgBin.get}/pg_ctl -D $pgRoot/data -m immediate stop")
    if (pgRoot != null)
      Process(Seq("rm", "-rf", pgRoot)).!
  }
}
