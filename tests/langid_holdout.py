"""HELD-OUT language-ID evaluation fixture (VERDICT r6 ask #2).

The planted-corpus accuracy test samples word salad from ``_WORDS`` —
the exact vocabulary the bigram profiles are built from — so its 1.0 is
an in-sample upper bound. These are ORIGINAL PROSE sentences written
for this fixture (everyday factual statements, no quoted text), whose
content words are deliberately NOT drawn from the top-frequency lists:
most tokens here ("mountain", "Bibliothek", "ventana", "boulangerie")
never appear in ``_WORDS``, so the model must generalize through its
character-bigram statistics, not memorized words.

Kept as plain data (no imports) so both the pytest eval and any ad-hoc
scoring can load it.
"""

HOLDOUT = {
    "en": [
        "The old lighthouse keeper climbed the narrow spiral staircase every evening before sunset.",
        "Heavy rain flooded the village square and washed gravel across the cobblestones.",
        "She planted tomatoes and basil along the southern wall of the garden.",
        "The committee postponed its decision until the engineers finished their report.",
        "A gray heron stood motionless at the edge of the frozen pond.",
        "Children gathered chestnuts under the trees behind the schoolyard fence.",
        "The museum restored the damaged painting using photographs from the archive.",
        "Fishermen repaired their nets on the quay while gulls circled overhead.",
        "The train slowed as it crossed the iron bridge above the river valley.",
        "Her grandmother kept dried lavender in small linen bags inside every drawer.",
        "The bakery on the corner sells rye bread only on Saturday mornings.",
        "Wind turbines lined the ridge, turning slowly against the autumn sky.",
        "He sharpened the axe carefully before splitting the oak logs for winter.",
        "The librarian catalogued the donated manuscripts throughout the long afternoon.",
        "Snow settled on the rooftops while the streetlamps flickered into life.",
        "The orchestra rehearsed the final movement twice before the conductor was satisfied.",
        "Wild strawberries grow along the path that leads down to the harbor.",
        "The carpenter measured the doorframe twice and cut the plank once.",
        "Morning fog drifted across the meadow and hid the grazing cattle.",
        "They repainted the fishing boats bright blue before the festival began.",
    ],
    "de": [
        "Der alte Leuchtturmwärter stieg jeden Abend die schmale Wendeltreppe hinauf.",
        "Starker Regen überschwemmte den Dorfplatz und spülte Kies über das Pflaster.",
        "Sie pflanzte Tomaten und Basilikum entlang der südlichen Gartenmauer.",
        "Der Ausschuss verschob seine Entscheidung, bis die Ingenieure ihren Bericht vorlegten.",
        "Ein grauer Reiher stand reglos am Rand des zugefrorenen Teiches.",
        "Die Kinder sammelten Kastanien unter den Bäumen hinter dem Schulzaun.",
        "Das Museum restaurierte das beschädigte Gemälde mit Fotografien aus dem Archiv.",
        "Die Fischer flickten ihre Netze am Kai, während die Möwen kreisten.",
        "Der Zug wurde langsamer, als er die eiserne Brücke über das Flusstal überquerte.",
        "Ihre Großmutter bewahrte getrockneten Lavendel in kleinen Leinensäckchen auf.",
        "Die Bäckerei an der Ecke verkauft Roggenbrot nur am Samstagmorgen.",
        "Windräder säumten den Bergrücken und drehten sich langsam vor dem Herbsthimmel.",
        "Er schärfte die Axt sorgfältig, bevor er die Eichenscheite für den Winter spaltete.",
        "Die Bibliothekarin katalogisierte die gestifteten Handschriften den ganzen Nachmittag.",
        "Schnee legte sich auf die Dächer, während die Straßenlaternen aufflackerten.",
        "Das Orchester probte den letzten Satz zweimal, bis der Dirigent zufrieden war.",
        "Walderdbeeren wachsen entlang des Pfades, der zum Hafen hinunterführt.",
        "Der Schreiner maß den Türrahmen zweimal und sägte das Brett nur einmal.",
        "Morgennebel zog über die Wiese und verbarg die weidenden Rinder.",
        "Vor dem Fest strichen sie die Fischerboote in leuchtendem Blau.",
    ],
    "es": [
        "El viejo farero subía cada tarde la estrecha escalera de caracol antes del anochecer.",
        "La lluvia intensa inundó la plaza del pueblo y arrastró grava sobre los adoquines.",
        "Ella plantó tomates y albahaca a lo largo del muro sur del jardín.",
        "El comité aplazó su decisión hasta que los ingenieros terminaran el informe.",
        "Una garza gris permanecía inmóvil al borde del estanque helado.",
        "Los niños recogían castañas bajo los árboles detrás de la cerca de la escuela.",
        "El museo restauró el cuadro dañado usando fotografías del archivo.",
        "Los pescadores remendaban sus redes en el muelle mientras las gaviotas volaban en círculos.",
        "El tren redujo la velocidad al cruzar el puente de hierro sobre el valle.",
        "Su abuela guardaba lavanda seca en pequeñas bolsas de lino dentro de cada cajón.",
        "La panadería de la esquina vende pan de centeno solo los sábados por la mañana.",
        "Los molinos de viento bordeaban la cresta, girando despacio contra el cielo otoñal.",
        "Afiló el hacha con cuidado antes de partir los troncos de roble para el invierno.",
        "La bibliotecaria catalogó los manuscritos donados durante toda la tarde.",
        "La nieve se posaba sobre los tejados mientras las farolas parpadeaban.",
        "La orquesta ensayó el último movimiento dos veces hasta que el director quedó satisfecho.",
        "Las fresas silvestres crecen junto al sendero que baja hacia el puerto.",
        "El carpintero midió el marco de la puerta dos veces y cortó la tabla una sola vez.",
        "La niebla matinal cruzaba la pradera y ocultaba al ganado que pastaba.",
        "Pintaron las barcas de pesca de azul brillante antes de que empezara la fiesta.",
    ],
    "fr": [
        "Le vieux gardien du phare montait chaque soir l'étroit escalier en colimaçon.",
        "La pluie battante a inondé la place du village et répandu du gravier sur les pavés.",
        "Elle a planté des tomates et du basilic le long du mur sud du jardin.",
        "Le comité a reporté sa décision jusqu'à ce que les ingénieurs remettent leur rapport.",
        "Un héron gris se tenait immobile au bord de l'étang gelé.",
        "Les enfants ramassaient des châtaignes sous les arbres derrière la clôture de l'école.",
        "Le musée a restauré le tableau endommagé grâce aux photographies des archives.",
        "Les pêcheurs réparaient leurs filets sur le quai pendant que les mouettes tournoyaient.",
        "Le train a ralenti en franchissant le pont de fer au-dessus de la vallée.",
        "Sa grand-mère gardait de la lavande séchée dans de petits sachets de lin.",
        "La boulangerie du coin ne vend du pain de seigle que le samedi matin.",
        "Des éoliennes bordaient la crête et tournaient lentement dans le ciel d'automne.",
        "Il a aiguisé la hache avec soin avant de fendre les bûches de chêne pour l'hiver.",
        "La bibliothécaire a catalogué les manuscrits donnés pendant tout l'après-midi.",
        "La neige se posait sur les toits tandis que les réverbères s'allumaient.",
        "L'orchestre a répété le dernier mouvement deux fois avant que le chef soit satisfait.",
        "Des fraises sauvages poussent le long du sentier qui descend vers le port.",
        "Le menuisier a mesuré le cadre de la porte deux fois et scié la planche une seule fois.",
        "La brume matinale glissait sur la prairie et cachait le bétail au pâturage.",
        "Ils ont repeint les bateaux de pêche en bleu vif avant le début de la fête.",
    ],
    # must land 'unknown': scripts outside the model's alphabet and
    # structureless noise
    "unknown": [
        "漢字の短い文章はこのモデルの対象外です",
        "Это предложение написано на русском языке",
        "Αυτή η πρόταση είναι γραμμένη στα ελληνικά",
        "한국어로 쓰인 짧은 문장입니다",
        "3f8a 91cc 0b2e 77d1 aa09 5c6e",
        "++ -- == << >> || && !!",
    ],
}
