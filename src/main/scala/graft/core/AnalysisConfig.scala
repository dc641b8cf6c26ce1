package graft.core

import java.io.FileInputStream
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Analysis sample configuration — the YAML surface of the reference
  * (reference phaseII-analysis-FS.yml:1-25, jet_test.yml:1-23): tree path,
  * eras with luminosity, and per-sample era/type/group/files/
  * generated-events/cross-section. Parsed with snakeyaml (already on the
  * Spark runtime classpath). Driver-side only — config, not data.
  */
final case class SampleConfig(
    name: String,
    era: String,
    sampleType: String, // MC | SIGNAL | DATA (reference `type:`)
    group: String,
    files: Seq[String],
    generatedEvents: Double,
    crossSection: Double)

final case class AnalysisConfig(
    tree: String,
    /** era → integrated luminosity (reference `luminosity: 3000000`). */
    eras: Map[String, Double],
    samples: Seq[SampleConfig]) {

  /** lumi × xsec / genEvents for one sample (DATA samples scale 1.0). */
  def scaleFor(s: SampleConfig): Double =
    if (s.sampleType.equalsIgnoreCase("DATA")) 1.0
    else graft.flow.Normalization.scaleFactor(eras(s.era), s.crossSection, s.generatedEvents)
}

object AnalysisConfig {

  def fromYamlFile(path: String): AnalysisConfig = {
    val in = new FileInputStream(path)
    try fromYaml(new Yaml().load[java.util.Map[String, Object]](in))
    finally in.close()
  }

  def fromYamlString(yaml: String): AnalysisConfig =
    fromYaml(new Yaml().load[java.util.Map[String, Object]](yaml))

  private def num(o: Object): Double = o match {
    case n: Number => n.doubleValue()
    case s: String => s.toDouble
    case other     => sys.error(s"not a number: $other")
  }

  private def fromYaml(root: java.util.Map[String, Object]): AnalysisConfig = {
    val tree = Option(root.get("tree")).map(_.toString).getOrElse("events")
    val eras = Option(root.get("eras")).map(_.asInstanceOf[java.util.Map[String, Object]].asScala.map {
      case (era, m) =>
        era -> num(m.asInstanceOf[java.util.Map[String, Object]].get("luminosity"))
    }.toMap).getOrElse(Map.empty)
    val samples = Option(root.get("samples")).map(_.asInstanceOf[java.util.Map[String, Object]].asScala.map {
      case (name, m0) =>
        val m = m0.asInstanceOf[java.util.Map[String, Object]]
        SampleConfig(
          name = name,
          era = Option(m.get("era")).map(_.toString).getOrElse(""),
          sampleType = Option(m.get("type")).map(_.toString).getOrElse("MC"),
          group = Option(m.get("group")).map(_.toString).getOrElse(name),
          files = Option(m.get("files")).map(_.asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq).getOrElse(Nil),
          generatedEvents = Option(m.get("generated-events")).map(num).getOrElse(1.0),
          crossSection = Option(m.get("cross-section")).map(num).getOrElse(1.0))
    }.toSeq).getOrElse(Nil)
    AnalysisConfig(tree, eras, samples)
  }
}
