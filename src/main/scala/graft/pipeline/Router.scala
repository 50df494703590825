package graft.pipeline

import graft.model.Schemas.JobStatus

/** Driver-side flow router — the reference's dispatch state machine
  * (processor.py:43-122; decision table README.md:70-77). Pure function of
  * the (1-row) job state + a staging-existence flag, so it never touches
  * executors.
  */
object Router {

  sealed trait Route
  case object SkipMissingJob extends Route // stale message: warn + skip
  case object SkipCompleted extends Route  // replayed message for done job
  case object Reprocessing extends Route   // user reviewed -> re-validate staging
  case object Initial extends Route        // first pass, or resume after restart

  def route(jobStatus: Option[String], hasStaging: Boolean): Route =
    jobStatus match {
      case None => SkipMissingJob
      case Some(JobStatus.Completed) => SkipCompleted
      case Some(JobStatus.NeedsReview) if hasStaging => Reprocessing
      case Some(_) => Initial // incl. NEEDS_REVIEW without staging, PENDING, PROCESSING resume
    }
}
