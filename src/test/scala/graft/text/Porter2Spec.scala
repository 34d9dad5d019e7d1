package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the Porter2 port. Expected values hand-derived by
  * executing the published Snowball "english" algorithm step by step
  * (derivations in comments where non-obvious); cross-checked against the
  * algorithm's documented examples.
  */
class Porter2Spec extends AnyFunSuite {

  private val golden: Seq[(String, String)] = Seq(
    // exception1 specials
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // exception1 invariants
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes",
    // exception2 (halt after step 1a)
    "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
    "herring" -> "herring", "earring" -> "earring", "proceed" -> "proceed",
    "exceed" -> "exceed", "succeed" -> "succeed",
    // length <= 2 untouched
    "a" -> "a", "is" -> "is", "by" -> "by", "it" -> "it",
    // step 1a documented examples
    "ties" -> "tie", "cries" -> "cri", "gas" -> "gas", "this" -> "this",
    "gaps" -> "gap", "kiwis" -> "kiwi", "classes" -> "class",
    "miss" -> "miss", "foxes" -> "fox",
    // step 1b
    "agreed" -> "agre", // eed in R1 → ee → "agree"; step5 drops final e
    "feed" -> "feed", // eed NOT in R1
    "hoping" -> "hope", // ing del → hop, short word → +e
    "hopping" -> "hop", // ing del → hopp, double → hop
    "hopped" -> "hop",
    "luxuriated" -> "luxuri", // ed del → luxuriat, ends 'at' → +e; step4 ate
    "running" -> "run", "caching" -> "cach",
    // step 1c
    "cry" -> "cri", "say" -> "say", "happy" -> "happi",
    // step 2
    "beautifully" -> "beauti", "generously" -> "generous",
    "optimization" -> "optim", "serialization" -> "serial",
    "sensitivity" -> "sensit", "ability" -> "abil",
    "capabilities" -> "capabl",
    // step 3 / R1-prefix exceptions (gener / commun / arsen)
    "national" -> "nation", "rational" -> "ration",
    "sensational" -> "sensat", "conditional" -> "condit",
    "generate" -> "generat", "generation" -> "generat",
    "generously2" -> "generously2", // digits: no suffix matches, unchanged
    "communication" -> "communic",
    "happiness" -> "happi", "beautiful" -> "beauti",
    "authorities" -> "author",
    // step 4
    "agreement" -> "agreement", // ement not in R2 (longest match blocks ment)
    "adjustment" -> "adjust", "dependence" -> "depend",
    // step 5
    "state" -> "state", "file" -> "file", "networks" -> "network",
    // original-cased input: uppercase letters are consonants / never match
    "Networks" -> "Network", "NETWORKS" -> "NETWORKS", "This" -> "This",
    // tech words used in the rank-identity suite
    "opengl" -> "opengl", "texture" -> "textur", "textures" -> "textur",
    "texturing" -> "textur", "shader" -> "shader", "shaders" -> "shader",
    "shading" -> "shade", "array" -> "array", "arrays" -> "array",
    "vertices" -> "vertic", "pointers" -> "pointer",
    // non-ASCII: no lowercase ASCII vowels → mostly untouched
    "café" -> "café", "данные" -> "данные")

  golden.foreach { case (in, want) =>
    test(s"porter2($in) == $want") {
      assert(Porter2.stem(in) == want)
    }
  }

  test("stemming is idempotent on its own outputs for the golden set") {
    golden.foreach { case (_, out) =>
      // not a Porter2 axiom in general, but holds for this fixture set and
      // guards against gross region-marking regressions
      val again = Porter2.stem(out)
      assert(again.length <= out.length)
    }
  }
}
