package graft.pipeline

import org.apache.spark.sql.DataFrame

/** filters.streamcallback analog (filters/StreamCallbackFilter.hpp:42-70):
  * the reference exposes a programmatic per-point callback set via API
  * (never via pipeline JSON — a std::function cannot be serialized
  * there either). Here callbacks are whole-DataFrame transforms
  * registered by name, so a JSON stage
  * `{"type":"filters.streamcallback","name":"..."}` can reference code
  * the embedding application registered; per-point semantics (mutate +
  * keep/drop bool) are expressed as select/filter inside the callback,
  * which keeps them inside Catalyst instead of an opaque row loop. */
object CallbackRegistry {
  private val fns =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame => DataFrame]()
  def register(name: String, fn: DataFrame => DataFrame): Unit = fns.put(name, fn)
  def apply(name: String): DataFrame => DataFrame =
    Option(fns.get(name)).getOrElse(throw new IllegalArgumentException(
      s"filters.streamcallback: no callback registered under '$name'"))
}

/** filters.shell analog (filters/ShellFilter.cpp:64-117): run a shell
  * command inline between stages — points pass through untouched, the
  * command's output is captured as stage metadata, and execution is
  * gated by an environment variable exactly like the reference's
  * PDAL_ALLOW_SHELL (:70-73). The command runs once on the driver (the
  * reference runs it once per pipeline, not per point). */
object ShellStage {
  @volatile var lastOutput: String = ""

  private def allowed: Boolean =
    sys.env.contains("GRAFT_ALLOW_SHELL") ||
      sys.props.contains("graft.allow.shell") // test hook

  def run(df: DataFrame, command: String): DataFrame = {
    if (!allowed) throw new IllegalStateException(
      "GRAFT_ALLOW_SHELL environment variable not set, shell access is not allowed")
    val p = new ProcessBuilder("/bin/sh", "-c", command)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val status = p.waitFor()
    if (status != 0) throw new RuntimeException(
      s"Command '$command' failed to execute with output '$out'")
    lastOutput = out
    df
  }
}
