package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** flink-ml pipeline API analog (SURVEY.md §2.11 — flink-ml-parent/
  * flink-ml-api/.../api/core/{PipelineStage, Estimator, Transformer,
  * Model, Pipeline}.java, params in api/misc/param/Params.java):
  * Estimators fit a DataFrame into a Model, Transformers map
  * DataFrames, and a Pipeline chains both — acting itself as an
  * Estimator when it contains an unfitted Estimator and as a
  * Transformer otherwise, exactly the reference's dual role
  * (Pipeline.java:60-75). Pipelines persist to JSON and back through
  * a stage registry, the Pipeline(String pipelineJson) constructor's
  * role.
  *
  * Spark-first posture: fitting is ordinary distributed aggregation
  * (one pass per Estimator); fitted Models hold only SCALAR summaries
  * (means, variances, weights) that ride into codegen'd map-only
  * transforms as literals — no per-row driver involvement, no UDFs.
  * The reference's two concrete pieces at this snapshot — the
  * MultivariateGaussian statistic (see `v8_gaussian_outlier`) and the
  * Params machinery — are the shapes the built-in stages below
  * exercise.
  */
object MlPipeline {

  /** Typed parameter map (Params.java: get with default, set, json). */
  final case class Params(m: Map[String, String] = Map.empty) {
    def set(k: String, v: Any): Params = Params(m + (k -> v.toString))
    def get(k: String, default: => String): String = m.getOrElse(k, default)
    def getDouble(k: String, default: => Double): Double =
      m.get(k).map(_.toDouble).getOrElse(default)
    def require(k: String): String = m.getOrElse(k,
      sys.error(s"missing required param '$k'"))
  }

  sealed trait PipelineStage {
    def params: Params
    /** Stable registry name for JSON persistence. */
    def stageName: String
  }
  trait Transformer extends PipelineStage {
    def transform(df: DataFrame): DataFrame
  }
  /** A fitted transformer (Model.java). */
  trait Model extends Transformer
  trait Estimator extends PipelineStage {
    def fit(df: DataFrame): Model
  }

  /** Standard-scaler Estimator over one numeric column: fit is ONE
    * distributed aggregate (mean, population variance with the same
    * epsilon floor the Gaussian statistic uses); the Model carries two
    * scalars and transforms map-only. Params: inputCol, outputCol,
    * eps. */
  final case class StandardScaler(params: Params) extends Estimator {
    val stageName = "standardScaler"
    def fit(df: DataFrame): Model = {
      val in = params.require("inputCol")
      val row = df.agg(
        avg(col(in).cast("double")).as("mu"),
        var_pop(col(in).cast("double")).as("v")).head()
      val eps = params.getDouble("eps", 1e-12)
      ScalerModel(params, row.getDouble(0), math.max(row.getDouble(1), eps))
    }
  }
  final case class ScalerModel(params: Params, mu: Double, v: Double)
      extends Model {
    val stageName = "scalerModel"
    def transform(df: DataFrame): DataFrame =
      df.withColumn(params.get("outputCol", "z"),
        (col(params.require("inputCol")).cast("double") - lit(mu))
          / lit(math.sqrt(v)))
  }

  /** Map-only sigmoid gate transformer (the x28 classifier-gate shape
    * as a pipeline stage): keepCol = 1 iff sigmoid(w·inputCol + b) >
    * threshold. Params: inputCol, keepCol, w, b, threshold. */
  final case class SigmoidGate(params: Params) extends Transformer {
    val stageName = "sigmoidGate"
    def transform(df: DataFrame): DataFrame = {
      val w = params.getDouble("w", 1.0)
      val b = params.getDouble("b", 0.0)
      val thr = params.getDouble("threshold", 0.5)
      val score = lit(1.0) /
        (lit(1.0) + exp(-(lit(w) * col(params.require("inputCol")) + lit(b))))
      df.withColumn(params.get("keepCol", "keep"),
        when(score > lit(thr), 1).otherwise(0))
    }
  }

  /** The dual-role chain (Pipeline.java): an Estimator while any
    * member still needs fitting, a Transformer once none does.
    * fit() folds the input through the stages — each Estimator fits
    * on the data AS TRANSFORMED SO FAR (the reference's semantics)
    * and its Model replaces it in the fitted pipeline. */
  final case class Pipeline(stages: Seq[PipelineStage]) extends Estimator
      with Transformer {
    val stageName = "pipeline"
    val params: Params = Params()
    def needFit: Boolean = stages.exists {
      case p: Pipeline => p.needFit
      case _: Estimator => true
      case _ => false
    }
    def fit(df: DataFrame): PipelineModel = {
      var cur = df
      val fitted = stages.map {
        case p: Pipeline if p.needFit =>
          val m = p.fit(cur); cur = m.transform(cur); m
        case e: Estimator =>
          val m = e.fit(cur); cur = m.transform(cur); m
        case t: Transformer => cur = t.transform(cur); t
      }
      PipelineModel(fitted.collect { case t: Transformer => t })
    }
    def transform(df: DataFrame): DataFrame = {
      require(!needFit,
        "pipeline contains an unfitted Estimator — call fit() first " +
          "(Pipeline.java makes the same check)")
      stages.foldLeft(df) {
        case (d, t: Transformer) => t.transform(d)
        case (_, s) => sys.error(s"unreachable: unfitted ${s.stageName}")
      }
    }
    def toJson: String = Pipeline.toJson(this)
  }
  /** A fully-fitted pipeline (Pipeline-as-Model). */
  final case class PipelineModel(fitted: Seq[Transformer]) extends Model {
    val stageName = "pipelineModel"
    val params: Params = Params()
    def transform(df: DataFrame): DataFrame =
      fitted.foldLeft(df)((d, t) => t.transform(d))
  }

  object Pipeline {
    /** JSON persistence through the stage registry — the
      * Pipeline(String pipelineJson) constructor's role. Scalar model
      * state rides in the params map, so a FITTED pipeline round-trips
      * too. */
    def toJson(p: Pipeline): String =
      p.stages.map {
        case m: ScalerModel =>
          obj(m.stageName, m.params.set("_mu", m.mu).set("_v", m.v))
        case inner: Pipeline =>
          s"""{"stage":"pipeline","stages":${toJson(inner)}}"""
        case pm: PipelineModel => // a fitted sub-pipeline re-opens as a
          // transformer-only pipeline of its fitted stages
          s"""{"stage":"pipeline","stages":${toJson(Pipeline(pm.fitted))}}"""
        case s => obj(s.stageName, s.params)
      }.mkString("[", ",", "]")

    private def obj(name: String, params: Params): String = {
      val ps = params.m.toSeq.sortBy(_._1).map { case (k, v) =>
        s""""${esc(k)}":"${esc(v)}"""" }.mkString("{", ",", "}")
      s"""{"stage":"${esc(name)}","params":$ps}"""
    }
    private def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

    def fromJson(json: String): Pipeline = Pipeline(parseStages(json))

    // minimal JSON reader for the writer above (no external deps)
    private def parseStages(s: String): Seq[PipelineStage] = {
      val stageRe =
        """\{"stage":"(\w+)"(?:,"params":\{([^}]*)\}|,"stages":(\[.*?\]))\}""".r
      stageRe.findAllMatchIn(s).map { m =>
        val name = m.group(1)
        if (name == "pipeline") Pipeline(parseStages(m.group(3)))
        else {
          val kvRe = """"((?:[^"\\]|\\.)*)":"((?:[^"\\]|\\.)*)"""".r
          val params = Params(kvRe.findAllMatchIn(Option(m.group(2))
              .getOrElse(""))
            .map(kv => unesc(kv.group(1)) -> unesc(kv.group(2))).toMap)
          name match {
            case "standardScaler" => StandardScaler(params)
            case "scalerModel" => ScalerModel(params,
              params.getDouble("_mu", sys.error("scalerModel needs _mu")),
              params.getDouble("_v", sys.error("scalerModel needs _v")))
            case "sigmoidGate" => SigmoidGate(params)
            case other => sys.error(s"unknown pipeline stage '$other' " +
              "(register it in MlPipeline.Pipeline.fromJson)")
          }
        }
      }.toSeq
    }
    private def unesc(s: String): String =
      s.replace("\\\"", "\"").replace("\\\\", "\\")
  }
}
