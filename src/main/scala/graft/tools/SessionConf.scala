package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared parser for the `GRAFT_SESSION_CONF` environment hook — the
  * comma-separated `key=value` session confs the measurement tools
  * ([[RunOne]], [[BenchLmServe]]) apply before running anything (e.g.
  * `graft.lm.positionalJoin=true`, or a `graft.lm.probeMaxWords`
  * ceiling to force a pruner regime).
  *
  * One parser, validated: an entry without `=` (or with an empty key)
  * fails with a message naming the variable and the offending entry
  * instead of an opaque MatchError. The separator is the comma, so
  * VALUES CANNOT CONTAIN COMMAS — none of the graft.* knobs take list
  * values; a conf that needs one belongs in the builder, not this
  * hook.
  */
object SessionConf {

  /** Apply `GRAFT_SESSION_CONF` (if set) to `spark`'s session conf. */
  def applyFromEnv(spark: SparkSession): Unit =
    sys.env.get("GRAFT_SESSION_CONF").foreach { raw =>
      raw.split(",").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty =>
            spark.conf.set(k.trim, v.trim)
          case _ => throw new IllegalArgumentException(
            s"GRAFT_SESSION_CONF entry '$kv' is not key=value " +
              "(comma-separated entries, e.g. " +
              "GRAFT_SESSION_CONF=graft.lm.positionalJoin=true," +
              "graft.lm.probeMaxWords=1024)")
        }
      }
    }
}
