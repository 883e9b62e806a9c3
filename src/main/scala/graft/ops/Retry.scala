package graft.ops

import scala.util.control.NonFatal

/** App-level retry (O3) — the reference relies on Airflow `retries: 2`
  * (`dags/yougile_etl_dag.py:31`); a standalone Spark driver owns its own
  * retry policy. `onFailure` is the alert hook (K2) for the final, fatal
  * attempt as well as intermediate ones.
  */
object Retry {
  def withRetries[A](retries: Int, onFailure: (Throwable, Int) => Unit = (_, _) => ())(f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case NonFatal(e) =>
          onFailure(e, attempt)
          if (attempt >= retries) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
